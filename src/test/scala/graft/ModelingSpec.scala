package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.queries.{Analytics, Mining, Modeling, Warehouse}

/** Semantics of the modeling/fusion/community queries on CONSTRUCTED
  * fixtures with known closed-form answers (the oracle compare proves
  * engine parity on real data; these prove the math is the math). Each
  * test writes a tiny parquet fixture dir holding only the tables the
  * query reads. */
class ModelingSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDir(): String =
    java.nio.file.Files.createTempDirectory("modeling_fix").toString

  private def one(df: DataFrame) = rows(df).head

  // ------------------------------------------------------------- q196

  test("ols: exact linear data recovers the coefficients and r2 = 1") {
    val dir = fixtureDir()
    // y = 10 + 2*x1 + 3*x2 exactly, non-collinear xs
    val pts = Seq((1, 1), (2, 3), (3, 2), (4, 5), (5, 4), (6, 6))
    pts.map { case (x1, x2) =>
      (x1.toDouble, x2 / 100.0, (10 + 2 * x1 + 3 * x2).toDouble)
    }.toDF("l_quantity", "l_discount", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = one(Modeling.q196.fn(spark, dir))
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Double]("beta_intercept") == 10.0)
    assert(r.getAs[Double]("beta_quantity") == 2.0)
    assert(r.getAs[Double]("beta_discount") == 3.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("ols: degenerate (constant regressors) yields null fit, not junk") {
    val dir = fixtureDir()
    Seq.fill(4)((5.0, 0.05, 123.0))
      .toDF("l_quantity", "l_discount", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = one(Modeling.q196.fn(spark, dir))
    assert(r.getAs[Long]("n_rows") == 4L)
    assert(r.isNullAt(r.fieldIndex("beta_quantity")))
    assert(r.isNullAt(r.fieldIndex("r2")))
    assert(r.getAs[Double]("mean_price") == 123.0)
  }

  // ------------------------------------------------------------- q197

  private def writeDocs(dir: String,
      docs: Seq[(Long, String, String, String, Long)]): Unit =
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

  test("chi2: the perfectly class-associated token ranks first") {
    val dir = fixtureDir()
    // "zebra" ⇔ en, "chien" ⇔ fr, "the" in every doc (df = n → dropped)
    val docs =
      (0L until 6L).map(i => (i, "zebra the", "en", "s", 9L)) ++
        (6L until 12L).map(i => (i, "chien the", "fr", "s", 9L))
    writeDocs(dir, docs)
    val out = rows(Modeling.q197.fn(spark, dir))
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("rk"),
        r.getAs[String]("word"), r.getAs[Double]("chi2")))
    // candidates are presence-bounded: each lang lists only its own
    // marker (the other marker's a=0 association shows up on the other
    // lang's list), and "the" (df = n) is filtered entirely
    assert(out.toSet == Set(("en", 1L, "zebra", 12.0),
      ("fr", 1L, "chien", 12.0))) // n=12 ⇒ χ² = n for perfect markers
  }

  // ------------------------------------------------------------- q198

  test("auc: perfect separation is 1, all-tied is 0.5, inverted is 0") {
    val dir = fixtureDir()
    val docs = Seq(
      // s1: every en doc longer than every fr doc → AUC 1
      (0L, "x", "en", "s1", 100L), (1L, "x", "en", "s1", 200L),
      (2L, "x", "fr", "s1", 10L), (3L, "x", "fr", "s1", 20L),
      // s2: identical scores → mid-rank AUC exactly 0.5
      (4L, "x", "en", "s2", 50L), (5L, "x", "fr", "s2", 50L),
      // s3: every en doc shorter → AUC 0
      (6L, "x", "en", "s3", 5L), (7L, "x", "fr", "s3", 500L))
    writeDocs(dir, docs)
    val out = rows(Modeling.q198.fn(spark, dir))
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("auc"))
      .toMap
    assert(out == Map("s1" -> 1.0, "s2" -> 0.5, "s3" -> 0.0))
  }

  // ------------------------------------------------------------- q199

  test("psi: a shifted source scores far above an on-distribution one") {
    val dir = fixtureDir()
    val docs =
      // s1/s2: identical length distributions (buckets 0 and 1)
      (0L until 8L).map(i => (i, "x", "en",
        if (i < 4) "s1" else "s2", if (i % 2 == 0) 50L else 150L)) ++
        // s3: all mass in the top bucket — drifted
        (8L until 12L).map(i => (i, "x", "en", "s3", 750L))
    writeDocs(dir, docs)
    val out = rows(Modeling.q199.fn(spark, dir))
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("psi"))
      .toMap
    assert(out("s1") == out("s2")) // same distribution ⇒ same PSI
    assert(out("s3") > 0.4) // full-bucket shift is far past alarm (0.2)
    assert(out("s1") < 0.4) // only smoothing + s3's pull on the ref
    assert(out("s3") > out("s1"))
  }

  // ------------------------------------------------------------- q202

  test("calibration: a perfectly calibrated bin gaps 0, an " +
      "overconfident bin gaps its full confidence") {
    val dir = fixtureDir()
    val docs = Seq(
      // pred 0.5 (250/500), half positive → calibrated
      (0L, "x", "en", "s", 250L), (1L, "x", "en", "s", 250L),
      (2L, "x", "fr", "s", 250L), (3L, "x", "fr", "s", 250L),
      // pred 1.0 (saturated at 500+), zero positive → gap 1.0
      (4L, "x", "fr", "s", 500L), (5L, "x", "fr", "s", 700L))
    writeDocs(dir, docs)
    val out = rows(Modeling.q202.fn(spark, dir))
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("mean_confidence"),
        r.getAs[Double]("positive_rate"), r.getAs[Double]("gap")))
      .sortBy(_._1)
    assert(out == Seq((5L, 4L, 0.5, 0.5, 0.0), (9L, 2L, 1.0, 0.0, 1.0)))
  }

  // ------------------------------------------------------------- q195

  test("label propagation: disjoint components converge to one " +
      "community each and never merge") {
    val dir = fixtureDir()
    // two disjoint complete-bipartite components
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (10L, 10L), (10L, 11L), (11L, 10L), (11L, 11L))
    edges.toDF("l_partkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = rows(Analytics.q195.fn(spark, dir))
      .map(r => (r.getAs[String]("community"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_parts"), r.getAs[Long]("n_suppliers")))
      .sortBy(_._1)
    // self-vote LPA: each K2,2 collapses to its min part label;
    // without the self-vote the bipartite sides would 2-cycle forever
    assert(out == Seq(("p:1", 4L, 2L, 2L), ("p:10", 4L, 2L, 2L)))
  }

  // ------------------------------------------------------------- q206

  test("hazard: censoring shrinks the risk set but adds no hazard, " +
      "and increments are exact integer divisions") {
    val dir = fixtureDir()
    // u1,u2: convert day 1; u3: never (censored at day 5, the
    // observation end); u4: converts day 0
    val ev = Seq(
      (1L, "view", "2024-01-01 08:00:00", 1L),
      (1L, "purchase", "2024-01-02 08:00:00", 2L),
      (2L, "view", "2024-01-01 09:00:00", 3L),
      (2L, "purchase", "2024-01-02 09:00:00", 4L),
      (3L, "view", "2024-01-01 10:00:00", 5L),
      (4L, "purchase", "2024-01-06 10:00:00", 6L))
    spark.createDataFrame(ev.map { case (u, t, tss, id) =>
        (id, ts(tss), u, t, 1.0, "{}")
      })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = rows(Warehouse.q206.fn(spark, dir))
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_conv"), r.getAs[Long]("n_censored"),
        r.getAs[Double]("cum_hazard")))
      .sortBy(_._1)
    // H: day0 1/4 = 0.25; day1 +2/3 -> 916666666/1e9; day5 censor only
    assert(out == Seq(
      (0L, 4L, 1L, 0L, 0.25),
      (1L, 3L, 2L, 0L, 0.916667),
      (5L, 1L, 0L, 1L, 0.916667)))
  }

  // ------------------------------------------------------------- q203

  test("mmr: greedy picks are distinct, first is pure relevance, and " +
      "every later pick's score satisfies the 7rel-3sim identity") {
    val dir = "/root/testdata/sf0.001"
    val out = rows(Mining.q203.fn(spark, dir))
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Int]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("pick")).sorted ==
        (1L to rs.length).toList)
      assert(rs.map(_.getAs[Long]("doc_id")).distinct.size == rs.size)
      rs.foreach { r =>
        if (r.getAs[Long]("pick") == 1L) {
          assert(r.isNullAt(r.fieldIndex("max_sim_q")))
          assert(r.isNullAt(r.fieldIndex("mmr_q")))
        } else {
          assert(r.getAs[Long]("mmr_q") ==
            7L * r.getAs[Long]("relevance_q") -
              3L * r.getAs[Long]("max_sim_q"))
        }
      }
    }
  }

  // ------------------------------------------------------------- q200

  test("rank fusion: fused points are the sum of the member lists' " +
      "points and ranking is total") {
    val dir = "/root/testdata/sf0.001"
    val out = rows(Mining.q200.fn(spark, dir))
    val byQ = out.groupBy(_.getAs[Int]("query_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(ranks == (1L to ranks.length).toList) // dense, no gaps
      assert(rs.map(_.getAs[Long]("doc_id")).distinct.size == rs.size)
      rs.foreach { r =>
        val pts = r.getAs[Long]("rrf_pts")
        val inL = r.getAs[Boolean]("in_lexical")
        val inD = r.getAs[Boolean]("in_dense")
        assert(inL || inD) // a fused row came from somewhere
        // points are sums of 1e9/(60+r) for r in 1..20 per membership
        val unit = (1 to 20).map(r => 1000000000L / (60 + r))
        val feasible =
          (if (inL) unit else Seq(0L)).flatMap(a =>
            (if (inD) unit else Seq(0L)).map(b => a + b)).toSet
        assert(feasible.contains(pts))
      }
    }
  }

  // ------------------------------------------------------------- q208

  private def writeDims(dir: String): Unit = {
    Seq((1, "NA", 1), (2, "NB", 2))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$dir/nation.parquet")
    Seq((1, "RA"), (2, "RB"))
      .toDF("r_regionkey", "r_name")
      .write.parquet(s"$dir/region.parquet")
  }

  test("gini: equal revenues score 0; concentration scores the rank " +
      "formula's closed form") {
    val dir = fixtureDir()
    writeDims(dir)
    (Seq(1L, 2L, 3L).map(k => (k, 1)) ++
      Seq(11L, 12L, 13L, 14L).map(k => (k, 2)))
      .toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$dir/customer.parquet")
    // RA: three equal customers → gini 0. RB: [1, 1, 1, 97] →
    // G = (2·39400 − 5·10000) / (4·10000) = 0.72 in cents
    (Seq(1L -> 100.0, 2L -> 100.0, 3L -> 100.0) ++
      Seq(11L -> 1.0, 12L -> 1.0, 13L -> 1.0, 14L -> 97.0))
      .toDF("o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val out = rows(Modeling.q208.fn(spark, dir))
      .map(r => r.getAs[String]("r_name") ->
        (r.getAs[Long]("n_customers"), r.getAs[Double]("gini")))
      .toMap
    assert(out("RA") == ((3L, 0.0)))
    assert(out("RB") == ((4L, 0.72)))
    graft.operators.InternalCache.release()
  }

  // ------------------------------------------------------------- q209

  test("acf: the 1,2,3 series has r1 = 0, r2 = -0.5, empty lags null") {
    val dir = fixtureDir()
    Seq(("2024-01-01", 1.0), ("2024-01-02", 2.0), ("2024-01-03", 3.0))
      .toDF("d", "o_totalprice")
      .select(col("d").cast("timestamp").as("o_orderdate"),
        col("o_totalprice"))
      .write.parquet(s"$dir/orders.parquet")
    // centered (×n): [-300, 0, 300]; den = 180000; lag1 num = 0;
    // lag2 num = 300·(−300) = −90000 → −0.5; lags 3+ have no pairs
    val out = rows(Modeling.q209.fn(spark, dir))
    assert(out.size == 7)
    val byLag = out.map(r => r.getAs[Long]("lag") ->
      (r.getAs[Long]("n_days"), r.getAs[Long]("n_pairs"),
        Option(r.getAs[java.lang.Double]("acf")))).toMap
    assert(byLag(1L) == ((3L, 2L, Some(0.0))))
    assert(byLag(2L) == ((3L, 1L, Some(-0.5))))
    (3L to 7L).foreach(k => assert(byLag(k) == ((3L, 0L, None))))
  }

  // ------------------------------------------------------------- q210

  private def writeQd(dir: String, qd: Seq[(Double, Double)]): Unit =
    qd.toDF("l_quantity", "l_discount")
      .write.parquet(s"$dir/lineitem.parquet")

  test("kendall: monotone grids hit ±1; a tied-out variable is null") {
    val dir = fixtureDir()
    writeQd(dir, Seq((1.0, 0.01), (2.0, 0.02), (3.0, 0.03)))
    val r = one(Modeling.q210.fn(spark, dir))
    assert(r.getAs[Long]("n_rows") == 3L)
    assert(r.getAs[Double]("tau_b") == 1.0)
    assert(r.getAs[Double]("concordant_share") == 1.0)
    assert(r.getAs[Double]("discordant_share") == 0.0)

    val dir2 = fixtureDir()
    writeQd(dir2, Seq((1.0, 0.03), (2.0, 0.02), (3.0, 0.01)))
    assert(one(Modeling.q210.fn(spark, dir2))
      .getAs[Double]("tau_b") == -1.0)

    val dir3 = fixtureDir()
    writeQd(dir3, Seq((5.0, 0.01), (5.0, 0.02), (5.0, 0.03)))
    val r3 = one(Modeling.q210.fn(spark, dir3))
    assert(r3.isNullAt(r3.fieldIndex("tau_b"))) // u1 = 0: no signal
  }

  // ------------------------------------------------------------- q214

  test("pca: a rank-1 covariance puts the whole component on its " +
      "axis with share 1") {
    val dir = fixtureDir()
    // all variance on dim 1, zero-mean; other dims identically 0
    Seq(0.5f, -0.5f, 0.25f, -0.25f).zipWithIndex.map { case (x, i) =>
      (i.toLong, x +: Seq.fill(63)(0.0f), i)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val out = rows(graft.queries.Prep.q214.fn(spark, dir))
    assert(out.size == 64)
    out.foreach { r =>
      val load = r.getAs[Double]("loading")
      if (r.getAs[Long]("dim") == 1L) assert(math.abs(load) == 1.0)
      else assert(load == 0.0)
      assert(r.getAs[Double]("explained_share") == 1.0)
    }
    graft.operators.SharedFrames.release()
  }

  // ------------------------------------------------------------- q215

  test("abtt isotropy: rank-1 vectors are fully explained — raw " +
      "|cos| is 1, post-removal cosines are degenerate-null") {
    val dir = fixtureDir()
    // all mass on the top component; vec_ids are stride multiples so
    // every vector is a probe
    Seq(0.5f, -0.5f, 0.25f, -0.25f).zipWithIndex.map { case (x, i) =>
      (i * 29L, x +: Seq.fill(63)(0.0f), i)
    }.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val r = one(graft.queries.Prep.q215.fn(spark, dir))
    assert(r.getAs[Long]("n_probes") == 4L)
    assert(r.getAs[Long]("n_pairs") == 6L)
    assert(r.getAs[Double]("mean_abs_cos_raw") == 1.0)
    // removing the only component zeroes every vector → no defined
    // cosine survives, and the gate reports null rather than NaN
    assert(r.isNullAt(r.fieldIndex("mean_abs_cos_abtt")))
    graft.operators.SharedFrames.release()
  }

  // ------------------------------------------------------------- q216

  test("bootstrap: a constant metric collapses the interval onto the " +
      "point estimate") {
    val dir = fixtureDir()
    // every resample of a constant column has the same mean, whatever
    // the Poisson weights drawn — CI must equal the point estimate
    (1L to 50L).map(k => (k, 123.45))
      .toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = one(Modeling.q216.fn(spark, dir))
    assert(r.getAs[Long]("n_rows") == 50L)
    assert(r.getAs[Long]("n_replicates") == 40L)
    assert(r.getAs[Double]("mean_value") == 123.45)
    assert(r.getAs[Double]("ci_lo") == 123.45)
    assert(r.getAs[Double]("ci_hi") == 123.45)
  }

  test("bootstrap: interval brackets the point estimate on real data") {
    val r = one(Modeling.q216.fn(spark, "/root/testdata/sf0.001"))
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("mean_value"))
    assert(r.getAs[Double]("mean_value") <= r.getAs[Double]("ci_hi"))
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ci_hi"))
  }

  // ------------------------------------------------------------- q212

  test("l-diversity: a uniform-balance group fails, a spread one " +
      "passes") {
    val dir = fixtureDir()
    writeDims(dir)
    // seg A / nation 1: bands {0, 1, 2} → l = 3 (passes L = 3)
    // seg B / nation 1: both in band 0 → l = 1 (fails, 2 rows at risk)
    Seq((1L, 1, 100.0, "A"), (2L, 1, 1100.0, "A"), (3L, 1, 2100.0, "A"),
      (4L, 1, 500.0, "B"), (5L, 1, 500.0, "B"))
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$dir/customer.parquet")
    val out = rows(graft.queries.Curation.q212.fn(spark, dir))
      .map(r => r.getAs[String]("level") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("min_diversity"),
          r.getAs[Long]("n_groups_failing"),
          r.getAs[Long]("n_rows_at_risk")))
      .toMap
    assert(out("nation") == ((2L, 1L, 1L, 2L)))
    assert(out("region") == ((2L, 1L, 1L, 2L)))
  }

  // ------------------------------------------------------------- q221

  test("ess: uniform weights are fully effective, a dominant doc " +
      "collapses the effective count") {
    val dir = fixtureDir()
    writeDocs(dir, Seq(
      (1L, "x", "en", "A", 5L), (2L, "x", "en", "A", 5L),
      (3L, "x", "en", "A", 5L), (4L, "x", "en", "A", 5L),
      (5L, "x", "en", "B", 9L), (6L, "x", "en", "B", 1L),
      (7L, "x", "en", "B", 1L), (8L, "x", "en", "B", 1L)))
    val out = rows(graft.queries.Curation.q221.fn(spark, dir))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_chars"),
          r.getAs[Double]("ess"), r.getAs[Double]("ess_ratio")))
      .toMap
    assert(out("A") == ((4L, 20L, 4.0, 1.0))) // equal weights: ESS = n
    // B: (12²)/84 = 1.714286, ratio 0.428571 — one giant doc dominates
    assert(out("B") == ((4L, 12L, 1.714286, 0.428571)))
  }

  // ------------------------------------------------------------- q222

  test("ks: disjoint supports score the overlap deficit, an " +
      "on-distribution source scores 0") {
    val dir = fixtureDir()
    writeDocs(dir, Seq(
      (1L, "x", "en", "A", 1L), (2L, "x", "en", "A", 1L),
      (3L, "x", "en", "B", 3L), (4L, "x", "en", "B", 3L),
      (5L, "x", "en", "C", 1L), (6L, "x", "en", "C", 3L)))
    val out = rows(graft.queries.Modeling.q222.fn(spark, dir))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("ks_d"))).toMap
    assert(out("A") == ((2L, 0.5))) // F_A(1)=1 vs F(1)=1/2
    assert(out("B") == ((2L, 0.5))) // F_B(1)=0 vs F(1)=1/2
    assert(out("C") == ((2L, 0.0))) // matches the corpus exactly
  }

  // ------------------------------------------------------------- q223

  test("seasonality: the index is mean daily revenue relative to the " +
      "overall mean") {
    val dir = fixtureDir()
    // 2024-01-01/08 are Mondays (isodow 1), 01-02 a Tuesday (2)
    Seq(("2024-01-01", 100.0), ("2024-01-02", 300.0),
      ("2024-01-08", 100.0), ("2024-01-08", 200.0))
      .toDF("ds", "o_totalprice")
      .select(col("ds").cast("date").as("o_orderdate"),
        col("o_totalprice"))
      .write.parquet(s"$dir/orders.parquet")
    val out = rows(graft.queries.Modeling.q223.fn(spark, dir))
      .map(r => r.getAs[Long]("dow") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("avg_daily_rev"),
          r.getAs[Double]("seasonal_index"))).toMap
    // Mon: 2 days totalling 400 → mean 200; overall mean 700/3
    assert(out(1L) == ((2L, 200.0, 0.857143)))
    assert(out(2L) == ((1L, 300.0, 1.285714)))
  }

  // ------------------------------------------------------------- q224

  test("hill: a tail of constant ratio 2 recovers alpha = 1/ln 2") {
    val dir = fixtureDir()
    // 100 orders at $20, the 101st at $10, filler below: every tail
    // term is ln 2, so alpha = 1/ln 2 = 1.442695
    val rows0 = (1 to 100).map(i => (i.toLong, 20.0)) ++
      Seq((101L, 10.0), (102L, 5.0), (103L, 4.0))
    rows0.toDF("o_orderkey", "o_totalprice")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.lit("2024-01-01").cast("date"))
      .write.parquet(s"$dir/orders.parquet")
    val r = one(Modeling.q224.fn(spark, dir))
    assert(r.getAs[Long]("k_tail") == 100L)
    assert(r.getAs[Long]("threshold_cents") == 1000L)
    assert(r.getAs[Double]("mean_ln_excess") == 0.693147)
    assert(r.getAs[Double]("hill_alpha") == 1.442695)
  }

  // ------------------------------------------------------------- q225

  test("cusum: a level shift is dated at the last day of the old " +
      "level") {
    val dir = fixtureDir()
    // days 1-3 at $100, days 4-6 at $200: max |cum_t - (t/n)S| = 150
    // at t = 3
    Seq(("2024-03-01", 100.0), ("2024-03-02", 100.0),
      ("2024-03-03", 100.0), ("2024-03-04", 200.0),
      ("2024-03-05", 200.0), ("2024-03-06", 200.0))
      .toDF("ds", "o_totalprice")
      .select(col("ds").cast("date").as("o_orderdate"),
        col("o_totalprice"))
      .write.parquet(s"$dir/orders.parquet")
    val r = one(Modeling.q225.fn(spark, dir))
    assert(r.getAs[Long]("n_days") == 6L)
    assert(r.getAs[java.sql.Date]("cp_date").toString == "2024-03-03")
    assert(r.getAs[Long]("cp_t") == 3L)
    assert(r.getAs[Double]("max_cusum") == 150.0)
  }

  // ------------------------------------------------------------- q229

  test("ab test: known 0.5-vs-0.25 split recovers the closed-form z") {
    val dir = fixtureDir()
    // even keys (variant 0): 2 of 4 convert; odd keys: 1 of 4
    Seq((2L, "1-URGENT"), (4L, "2-HIGH"), (6L, "5-LOW"), (8L, "5-LOW"),
      (1L, "1-URGENT"), (3L, "5-LOW"), (5L, "5-LOW"), (7L, "3-MEDIUM"))
      .toDF("o_orderkey", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val r = one(Modeling.q229.fn(spark, dir))
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("conv_a") == 2L)
    assert(r.getAs[Long]("n_b") == 4L && r.getAs[Long]("conv_b") == 1L)
    assert(r.getAs[Double]("rate_a") == 0.5)
    assert(r.getAs[Double]("rate_b") == 0.25)
    // z = 0.25 / sqrt(0.375·0.625·0.5) = 0.730297
    assert(r.getAs[Double]("z_score") == 0.730297)
  }

  // ------------------------------------------------------------- q231

  test("trimmed/winsorized: one outlier is dropped by the trim and " +
      "clamped by the winsorization") {
    val dir = fixtureDir()
    val vals = (1 to 18).map(_.toDouble) ++ Seq(50.0, 1000.0)
    vals.zipWithIndex.map { case (v, i) => (i.toLong + 1, v) }
      .toDF("o_orderkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = one(Modeling.q231.fn(spark, dir))
    assert(r.getAs[Long]("n_rows") == 20L)
    assert(r.getAs[Long]("k_trim") == 1L)
    assert(r.getAs[Double]("cut_lo") == 2.0)
    assert(r.getAs[Double]("cut_hi") == 50.0)
    // interior = {2..18, 50}: sum 220 over 18 rows
    assert(r.getAs[Double]("trimmed_mean") == 12.222222)
    // winsorized: 220 + 2 + 50 over all 20 rows
    assert(r.getAs[Double]("winsorized_mean") == 13.6)
  }

  // ------------------------------------------------------------- q230

  test("randomized response: the debiased estimate recovers an " +
      "all-true population within noise, and the identities hold") {
    val dir = fixtureDir()
    writeDocs(dir, (1 to 400).map(i =>
      (i.toLong, "x", "en", "A", 1L)))
    val r = one(graft.queries.Curation.q230.fn(spark, dir))
    val n = r.getAs[Long]("n_docs")
    val obs = r.getAs[Long]("n_reported_true")
    val est = r.getAs[Double]("est_true")
    assert(n == 400L)
    assert(r.getAs[Long]("n_actual_true") == 400L)
    // exact estimator identity, then the 7-sigma sanity band
    assert(est == (4.0 * obs - n) / 2.0)
    assert(r.getAs[Double]("est_error") == est - 400.0)
    assert(obs >= 240L && obs <= 360L, s"obs $obs")
    assert(est >= 320.0 && est <= 480.0, s"est $est")
  }

  // ------------------------------------------------------------- q233

  test("cohort ltv: cumulative per-customer revenue tracks months " +
      "since first order") {
    val dir = fixtureDir()
    Seq((1L, "2024-01-15", 10.0), (1L, "2024-03-20", 5.0),
      (2L, "2024-01-05", 20.0))
      .toDF("o_custkey", "ds", "o_totalprice")
      .select(col("o_custkey"), col("ds").cast("date").as("o_orderdate"),
        col("o_totalprice"))
      .write.parquet(s"$dir/orders.parquet")
    val out = rows(graft.queries.Pipeline.q233.fn(spark, dir))
      .map(r => r.getAs[Long]("age_months") ->
        (r.getAs[Long]("n_customers"), r.getAs[Double]("cum_ltv")))
      .toMap
    assert(out(0L) == ((2L, 15.0))) // (10+20)/2 at age 0
    assert(out(2L) == ((2L, 17.5))) // +5 two months later
  }

  // ------------------------------------------------------------- q234

  test("mrr movement: new/expansion/contraction/churn decompose the " +
      "month-over-month bridge") {
    val dir = fixtureDir()
    Seq((1L, "2024-01-10", 10.0), (1L, "2024-02-10", 15.0),
      (2L, "2024-01-11", 10.0),
      (3L, "2024-02-12", 8.0),
      (4L, "2024-01-13", 10.0), (4L, "2024-02-13", 6.0))
      .toDF("o_custkey", "ds", "o_totalprice")
      .select(col("o_custkey"), col("ds").cast("date").as("o_orderdate"),
        col("o_totalprice"))
      .write.parquet(s"$dir/orders.parquet")
    val out = rows(graft.queries.Pipeline.q234.fn(spark, dir))
      .map(r => r.getAs[java.time.LocalDateTime]("month").toLocalDate.toString ->
        (r.getAs[Long]("n_active"), r.getAs[Double]("new_mrr"),
          r.getAs[Double]("expansion_mrr"),
          r.getAs[Double]("contraction_mrr"),
          r.getAs[Double]("churned_mrr"), r.getAs[Double]("net_change")))
      .toMap
    assert(out("2024-01-01") == ((3L, 30.0, 0.0, 0.0, 0.0, 30.0)))
    assert(out("2024-02-01") == ((3L, 8.0, 5.0, 4.0, 10.0, -1.0)))
    // quick ratio only exists where churn+contraction > 0
    val feb = rows(graft.queries.Pipeline.q234.fn(spark, dir))
      .find(_.getAs[java.time.LocalDateTime]("month").toLocalDate.toString == "2024-02-01").get
    assert(feb.getAs[Double]("quick_ratio") == 0.928571) // 13/14
    val jan = rows(graft.queries.Pipeline.q234.fn(spark, dir))
      .find(_.getAs[java.time.LocalDateTime]("month").toLocalDate.toString == "2024-01-01").get
    assert(jan.isNullAt(jan.fieldIndex("quick_ratio")))
  }

  // ------------------------------------------------------------- q235

  test("pareto: the 80% cut counts exactly the prefix below the " +
      "threshold, and the top decile share is exact") {
    val dir = fixtureDir()
    val revs = Seq(500.0, 300.0, 100.0, 50.0, 30.0, 10.0, 5.0, 3.0,
      1.0, 1.0)
    revs.zipWithIndex.map { case (v, i) => (i.toLong + 1, v) }
      .toDF("o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = one(graft.queries.Relational.q235.fn(spark, dir))
    assert(r.getAs[Long]("n_customers") == 10L)
    // prefixes 0 and 500 are < 800; 800 is not → exactly 2 customers
    assert(r.getAs[Long]("customers_for_80pct") == 2L)
    assert(r.getAs[Double]("share_of_customers") == 0.2)
    assert(r.getAs[Double]("top_decile_revenue_share") == 0.5)
  }

  // ------------------------------------------------------------- q236

  test("purchase gaps: per-customer lags bucket into capped weeks") {
    val dir = fixtureDir()
    Seq((1L, 101L, "2024-01-01"), (1L, 102L, "2024-01-03"),
      (1L, 103L, "2024-03-01"), // gaps: 2 d (wk 0), 58 d (wk 8)
      (2L, 201L, "2024-06-01"), // single order: no gap
      (3L, 301L, "2024-01-01"), (3L, 302L, "2024-12-31")) // 365 d → cap
      .toDF("o_custkey", "o_orderkey", "ds")
      .select(col("o_custkey"), col("o_orderkey"),
        col("ds").cast("date").as("o_orderdate"))
      .write.parquet(s"$dir/orders.parquet")
    val out = rows(graft.queries.Relational.q236.fn(spark, dir))
      .map(r => r.getAs[Long]("gap_weeks") ->
        (r.getAs[Long]("n_gaps"), r.getAs[Double]("share"))).toMap
    assert(out == Map(0L -> ((1L, 0.333333)), 8L -> ((1L, 0.333333)),
      12L -> ((1L, 0.333333))))
  }

  // ------------------------------------------------------------- q237

  test("abc: the 80/95 boundaries split head, middle, and tail " +
      "exactly") {
    val dir = fixtureDir()
    Seq((1L, 800.0), (2L, 150.0), (3L, 50.0))
      .toDF("l_partkey", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = rows(graft.queries.Relational.q237.fn(spark, dir))
      .map(r => r.getAs[String]("abc_class") ->
        (r.getAs[Long]("n_parts"), r.getAs[Double]("revenue"),
          r.getAs[Double]("revenue_share"))).toMap
    assert(out("A") == ((1L, 800.0, 0.8)))
    assert(out("B") == ((1L, 150.0, 0.15))) // prefix 800 = exactly 80%
    assert(out("C") == ((1L, 50.0, 0.05))) // prefix 950 = exactly 95%
  }

  // ------------------------------------------------------------- q238

  test("sla: exact p50/p90 from the bounded lag histogram") {
    val dir = fixtureDir()
    Seq((1L, "2024-01-01"), (2L, "2024-01-01"), (3L, "2024-01-01"))
      .toDF("o_orderkey", "ds")
      .select(col("o_orderkey"), col("ds").cast("date").as("o_orderdate"),
        org.apache.spark.sql.functions.lit("1-URGENT")
          .as("o_orderpriority"))
      .write.parquet(s"$dir/orders.parquet")
    Seq((1L, "2024-01-01"), (2L, "2024-01-11"), (3L, "2024-02-10"))
      .toDF("l_orderkey", "ds")
      .select(col("l_orderkey"), col("ds").cast("date").as("l_shipdate"))
      .write.parquet(s"$dir/lineitem.parquet")
    val r = one(graft.queries.Relational.q238.fn(spark, dir))
    assert(r.getAs[String]("priority") == "1-URGENT")
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Long]("p50_days") == 10L) // lags 0, 10, 40
    assert(r.getAs[Long]("p90_days") == 40L)
    assert(r.getAs[Double]("pct_within_30d") == 0.666667)
  }

  // ------------------------------------------------------------- q239

  test("lorenz: uniform 1..10 revenues trace the exact triangular " +
      "curve") {
    val dir = fixtureDir()
    (1 to 10).map(i => (i.toLong, i.toDouble))
      .toDF("o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val out = rows(graft.queries.Relational.q239.fn(spark, dir))
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_cum"), r.getAs[Double]("rev_share"))).toMap
    assert(out.size == 10)
    assert(out(1L) == ((1L, 0.018182))) // 1/55
    assert(out(5L) == ((5L, 0.272727))) // 15/55
    assert(out(10L) == ((10L, 1.0)))
  }

  // ------------------------------------------------------------- q240

  test("heaps: one new word per two-token doc fits beta 1, " +
      "lnK = -ln 2, r2 = 1") {
    val dir = fixtureDir()
    writeDocs(dir, (1 to 10).map(i =>
      (i.toLong, s"w$i w$i", "en", "A", 5L)))
    val r = one(graft.queries.Mining.q240.fn(spark, dir))
    assert(r.getAs[Long]("n_docs") == 10L)
    assert(r.getAs[Long]("total_tokens") == 20L)
    assert(r.getAs[Long]("total_vocab") == 10L)
    assert(math.abs(r.getAs[Double]("heaps_beta") - 1.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("heaps_lnk") + 0.693147) < 1e-4)
    assert(r.getAs[Double]("r2") > 0.9999)
  }

  // ------------------------------------------------------------- q241

  test("repeat rate: one loyal and one single-order customer split " +
      "the KPIs exactly") {
    val dir = fixtureDir()
    Seq((1L, 10.0), (1L, 20.0), (2L, 5.0))
      .toDF("o_custkey", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = one(graft.queries.Relational.q241.fn(spark, dir))
    assert(r.getAs[Long]("n_customers") == 2L)
    assert(r.getAs[Long]("n_orders") == 3L)
    assert(r.getAs[Long]("n_repeat_customers") == 1L)
    assert(r.getAs[Double]("repeat_rate") == 0.5)
    assert(r.getAs[Double]("orders_per_customer") == 1.5)
    assert(r.getAs[Double]("repeat_revenue_share") == 0.857143) // 30/35
  }

  // ------------------------------------------------------------- q242

  test("basket profile: line-count buckets carry exact share and " +
      "averages") {
    val dir = fixtureDir()
    Seq((1L, 1L, 10.0), (1L, 1L, 10.0), (2L, 2L, 5.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = rows(graft.queries.Relational.q242.fn(spark, dir))
      .map(r => r.getAs[Long]("n_lines") ->
        (r.getAs[Long]("n_orders"), r.getAs[Double]("order_share"),
          r.getAs[Double]("avg_distinct_parts"),
          r.getAs[Double]("avg_order_value"))).toMap
    assert(out(2L) == ((1L, 0.5, 1.0, 20.0))) // same part twice
    assert(out(1L) == ((1L, 0.5, 1.0, 5.0)))
  }

  // ------------------------------------------------------------- q232

  test("codebook balance: every subspace reports bounded utilization " +
      "and a normalized entropy") {
    val out = rows(graft.queries.Llm.q232.fn(spark,
      "/root/testdata/sf0.001"))
    assert(out.map(_.getAs[Long]("subspace")).sorted == Seq(0L, 1L,
      2L, 3L))
    out.foreach { r =>
      val used = r.getAs[Long]("n_codes_used")
      val top = r.getAs[Double]("top_code_share")
      val h = r.getAs[Double]("norm_entropy")
      assert(used >= 1L && used <= 8L, s"used $used")
      assert(top >= 1.0 / 8 - 1e-9 && top <= 1.0, s"top $top")
      assert(h >= 0.0 && h <= 1.0 + 1e-9, s"entropy $h")
      // a usable subquantizer is neither one-hot nor missing codes
      assert(!(used == 1L && h > 0.0))
    }
    graft.operators.SharedFrames.release()
  }
}
