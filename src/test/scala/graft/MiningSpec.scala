package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Graph, NaiveBayes, Sampling, TfIdf}

/** The mining/warehouse operators added with q135-q140: CDC apply
  * semantics, triangle counting on known graphs, weighted-sample
  * determinism, NB separability, TF-IDF pair symmetry bounds. */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- Cdc

  private def baseDf = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
    .toDF("k", "v")

  test("cdc: latest seq wins, delete removes, upsert inserts") {
    val log = Seq(
      (1L, 1L, "U", 11.0), (1L, 2L, "U", 12.0), // double update
      (2L, 1L, "D", 0.0), //                       delete
      (4L, 1L, "I", 40.0), //                      late insert
      (5L, 1L, "U", 50.0), (5L, 2L, "D", 0.0), //  insert then delete
      (6L, 1L, "D", 0.0), (6L, 2L, "U", 60.0)) //  delete then re-add
      .toDF("k", "seq", "op", "v")
    val out = rows(Cdc.apply(baseDf, log, Seq("k"), "seq", "op")
      .orderBy("k"))
      .map(r => (r.getAs[Long]("k"), r.getAs[Double]("v"),
        r.getAs[Long]("last_seq"), r.getAs[Long]("n_ops")))
    assert(out == Seq(
      (1L, 12.0, 2L, 2L), // latest update won
      (3L, 30.0, -1L, 0L), // untouched base row
      (4L, 40.0, 1L, 1L),
      (6L, 60.0, 2L, 2L))) // re-added after delete
  }

  test("cdc: empty changelog is identity") {
    val empty = Seq.empty[(Long, Long, String, Double)]
      .toDF("k", "seq", "op", "v")
    val out = Cdc.apply(baseDf, empty, Seq("k"), "seq", "op")
    assert(rows(out.orderBy("k")).map(r => (r.getAs[Long]("k"),
      r.getAs[Double]("v"))) == Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("survivorship: per-field latest non-null wins; all-null stays " +
      "null; fields from different records combine") {
    val recs = Seq(
      (1L, 1L, Option("a"), Option(10.0)),
      (1L, 2L, None, Option(20.0)), //       name null: keeps seq1's "a"
      (1L, 3L, Option("c"), None), //        bal null: keeps seq2's 20.0
      (2L, 1L, None: Option[String], None: Option[Double]), // all null
      (2L, 2L, None, None))
      .toDF("k", "seq", "name", "bal")
    val out = rows(Cdc.survivorship(recs, Seq("k"), "seq").orderBy("k"))
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("name"),
        Option(r.getAs[Any]("bal")), r.getAs[Long]("n_records")))
    assert(out == Seq(
      (1L, "c", Some(20.0), 3L),
      (2L, null, None, 2L)))
  }

  test("expirePartitions: metadata-only drop below the cutoff") {
    spark.sql("DROP TABLE IF EXISTS exp_test")
    graft.sources.Materialize.dropOrphanLocation(spark, "exp_test")
    Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L))
      .toDF("day", "v")
      .write.mode("overwrite").format("parquet")
      .partitionBy("day").saveAsTable("exp_test")
    val kept = graft.sources.Materialize
      .expirePartitions(spark, "exp_test", "day", "2024-01-02")
    assert(rows(kept.select("day").distinct().orderBy("day"))
      .map(_.getString(0)) == Seq("2024-01-02", "2024-01-03"))
    // dropped partition is gone from catalog metadata too
    val parts = rows(spark.sql("SHOW PARTITIONS exp_test"))
      .map(_.getString(0))
    assert(parts == Seq("day=2024-01-02", "day=2024-01-03"), parts)
    spark.sql("DROP TABLE IF EXISTS exp_test")
  }

  // ------------------------------------------------- triangle counting

  private def edges(es: (Long, Long)*) = es.toSeq.toDF("a", "b")

  test("triangles: K4 has 4 triangles, gcc 1.0") {
    val k4 = edges((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    val r = rows(Graph.triangleStats(k4)).head
    assert(r.getAs[Long]("n_triangles") == 4L)
    assert(r.getAs[Long]("n_wedges") == 12L)
    assert(r.getAs[Double]("gcc") == 1.0)
    graft.operators.InternalCache.release()
  }

  test("triangles: a star has none; path graph has none") {
    val star = edges((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(rows(Graph.triangleStats(star)).head
      .getAs[Long]("n_triangles") == 0L)
    graft.operators.InternalCache.release()
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    assert(rows(Graph.triangleStats(path)).head
      .getAs[Long]("n_triangles") == 0L)
    graft.operators.InternalCache.release()
  }

  test("adamic-adar: square graph scores both diagonals, skips edges") {
    // C4: 1-3, 1-4, 2-3, 2-4 — every node degree 2. Non-adjacent
    // diagonals (1,2) and (3,4) each have two common neighbors of
    // degree 2, so aa = 2·round(1e6/ln 2) exactly.
    val sq = edges((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    val out = rows(Graph.adamicAdar(sq, maxDeg = 64, scale = 1000000L))
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb"),
        r.getAs[Long]("n_common"), r.getAs[Long]("aa")))
      .toSet
    val w2 = math.round(1000000.0 / math.log(2.0)) // 1442695
    assert(out == Set((1L, 2L, 2L, 2 * w2), (3L, 4L, 2L, 2 * w2)))
    graft.operators.InternalCache.release()
  }

  test("adamic-adar: hub over the cap contributes no wedges") {
    // star center 9 has degree 3 > cap 2 → no predicted pairs at all
    val star = edges((1L, 9L), (2L, 9L), (3L, 9L))
    assert(rows(Graph.adamicAdar(star, maxDeg = 2, scale = 1000000L))
      .isEmpty)
    graft.operators.InternalCache.release()
    // same graph, cap 3: all three leaf pairs predicted via the center
    val w3 = math.round(1000000.0 / math.log(3.0))
    val out = rows(Graph.adamicAdar(star, maxDeg = 3, scale = 1000000L))
      .map(r => (r.getAs[Long]("pa"), r.getAs[Long]("pb"),
        r.getAs[Long]("n_common"), r.getAs[Long]("aa")))
      .toSet
    assert(out == Set((1L, 2L, 1L, w3), (1L, 3L, 1L, w3),
      (2L, 3L, 1L, w3)))
    graft.operators.InternalCache.release()
  }

  test("triangles: one triangle with a pendant edge") {
    val g = edges((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val r = rows(Graph.triangleStats(g)).head
    assert(r.getAs[Long]("n_triangles") == 1L)
    // wedges: deg 2,2,3,1 -> 1+1+3+0 = 5; gcc = 3/5
    assert(r.getAs[Long]("n_wedges") == 5L)
    assert(r.getAs[Double]("gcc") == 0.6)
    graft.operators.InternalCache.release()
  }

  // --------------------------------------------------------- sampling

  test("weighted sample: deterministic under repartitioning, k rows") {
    val df = (1L to 500L).map(i => (i, i.toDouble)).toDF("id", "w")
    // cross-engine contract: the ranked key is an integer (the 1e-12
    // grid), never a raw double — r7's driver-environment failure mode
    assert(Sampling.weightedSample(df, col("id"), col("w"), 50, "t")
      .schema("ws_key").dataType ==
      org.apache.spark.sql.types.LongType)
    val s1 = rows(Sampling.weightedSample(df, col("id"), col("w"), 50,
      "t").select("id", "rnk").orderBy("rnk"))
      .map(r => (r.getLong(0), r.getLong(1)))
    val s2 = rows(Sampling.weightedSample(df.repartition(7), col("id"),
      col("w"), 50, "t").select("id", "rnk").orderBy("rnk"))
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s1 == s2)
    assert(s1.size == 50)
    // heavier rows should dominate: the sample mean id must exceed the
    // population mean by a wide margin (weights grow linearly in id)
    val meanId = s1.map(_._1).sum.toDouble / s1.size
    assert(meanId > 300.0, s"weighted draw looks uniform: mean $meanId")
  }

  test("stratified weighted sample: k per group, independent draws, " +
      "deterministic under repartitioning") {
    val df = (1L to 300L).map(i => (s"g${i % 3}", i, 1.0 + (i % 7)))
      .toDF("g", "id", "w")
    val s1 = rows(Sampling.weightedSamplePerGroup(df, Seq("g"), col("id"),
      col("w"), 10, "t2").select("g", "id", "rnk").orderBy("g", "rnk"))
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val s2 = rows(Sampling.weightedSamplePerGroup(df.repartition(5),
      Seq("g"), col("id"), col("w"), 10, "t2")
      .select("g", "id", "rnk").orderBy("g", "rnk"))
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(s1 == s2)
    assert(s1.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map("g0" -> 10, "g1" -> 10, "g2" -> 10))
  }

  test("weighted sample: a sub-contract weight fails loudly, not " +
      "silently off-grid") {
    // weight < 0.005 pushes |key·1e12| past 2^53 — the guard must
    // surface the violation instead of silently losing grid exactness
    val df = Seq((1L, 0.5), (2L, 0.001)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(df, col("id"), col("w"), 2, "g").collect()
    }
    def chain(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("0.005")), chain(e).mkString(" | "))
    // and a conforming frame is untouched by the guard
    val ok = Seq((1L, 0.5), (2L, 0.005)).toDF("id", "w")
    assert(rows(Sampling.weightedSample(ok, col("id"), col("w"), 2, "g"))
      .size == 2)
  }

  // ------------------------------------------------------ naive bayes

  test("naive bayes: separable vocabularies classify perfectly") {
    val docs = (1 to 30).map { i =>
      if (i % 2 == 0) (i.toLong, "aaa bbb aaa ccc", "en")
      else (i.toLong, "xxx yyy zzz yyy", "fr")
    }.toDF("id", "text", "lab")
    val out = NaiveBayes.trainPredict(docs, "id", "text", "lab", 100, 1000000L)
    assert(rows(out.filter(col("label") =!= col("pred"))).isEmpty)
  }

  test("classifier prf: a separable corpus scores 1.0 across the " +
      "board") {
    val dir =
      java.nio.file.Files.createTempDirectory("mining_fix").toString
    (1 to 30).map { i =>
      if (i % 2 == 0) (i.toLong, "aaa bbb aaa ccc", "en")
      else (i.toLong, "xxx yyy zzz yyy", "fr")
    }.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val out = rows(graft.queries.Mining.q217.fn(spark, dir))
      .map(r => r.getAs[String]("label") ->
        (r.getAs[Long]("n_true"), r.getAs[Long]("n_pred"),
          r.getAs[Long]("tp"), r.getAs[Double]("precision_"),
          r.getAs[Double]("recall_"), r.getAs[Double]("f1")))
      .toMap
    assert(out("en") == ((15L, 15L, 15L, 1.0, 1.0, 1.0)))
    assert(out("fr") == ((15L, 15L, 15L, 1.0, 1.0, 1.0)))
    graft.operators.SharedFrames.release()
  }

  test("kappa panel: a perfect classifier scores 1.0 on every metric") {
    val dir =
      java.nio.file.Files.createTempDirectory("mining_fix").toString
    (1 to 30).map { i =>
      if (i % 2 == 0) (i.toLong, "aaa bbb aaa ccc", "en")
      else (i.toLong, "xxx yyy zzz yyy", "fr")
    }.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val r = rows(graft.queries.Mining.q219.fn(spark, dir)).head
    assert(r.getAs[Long]("n_docs") == 30L)
    assert(r.getAs[Long]("n_classes") == 2L)
    assert(r.getAs[Double]("accuracy") == 1.0)
    assert(r.getAs[Double]("kappa") == 1.0)
    assert(r.getAs[Double]("mcc") == 1.0)
    assert(r.getAs[Double]("macro_f1") == 1.0)
    graft.operators.SharedFrames.release()
  }

  test("zipf fit: an exact 1/rank corpus recovers slope -1, r2 1") {
    val dir =
      java.nio.file.Files.createTempDirectory("mining_fix").toString
    // counts 12/r at ranks 1..4: ln c = ln 12 - ln r exactly
    val text = (Seq.fill(12)("wa") ++ Seq.fill(6)("wb") ++
      Seq.fill(4)("wc") ++ Seq.fill(3)("wd")).mkString(" ")
    Seq((1L, text, "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val r = rows(graft.queries.Mining.q218.fn(spark, dir)).head
    assert(r.getAs[String]("lang") == "en")
    assert(r.getAs[Long]("n_terms") == 4L)
    assert(math.abs(r.getAs[Double]("zipf_slope") + 1.0) < 1e-4)
    assert(r.getAs[Double]("r2") > 0.9999)
  }

  test("burstiness: spread term hits VMR 0, concentrated term is " +
      "over-dispersed") {
    val dir =
      java.nio.file.Files.createTempDirectory("mining_fix").toString
    // 4 docs; 'aa' twice in every doc (VMR 0); 'bb' 8x in doc 1:
    // VMR = (4*64 - 64)/(4*8) = 6
    Seq(
      (1L, ("aa aa " + Seq.fill(8)("bb").mkString(" ")), "en"),
      (2L, "aa aa cc", "en"),
      (3L, "aa aa", "en"),
      (4L, "aa aa", "en"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val out = rows(graft.queries.Mining.q220.fn(spark, dir))
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("rnk"), r.getAs[Long]("df"),
          r.getAs[Long]("total_cnt"), r.getAs[Double]("vmr"),
          r.getAs[Double]("mean_in_docs"))).toMap
    assert(out("aa") == ((1L, 4L, 8L, 0.0, 2.0))) // tie: word asc
    assert(out("bb") == ((2L, 1L, 8L, 6.0, 8.0)))
    assert(out("cc") == ((3L, 1L, 1L, 0.75, 1.0)))
  }

  test("novelty: a head-vocab-only source scores 0, a rare token " +
      "raises the mean IDF") {
    val dir =
      java.nio.file.Files.createTempDirectory("mining_fix").toString
    Seq((1L, "ww", "A"), (2L, "ww", "A"),
      (3L, "ww rr", "B"), (4L, "ww", "B"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val out = rows(graft.queries.Mining.q227.fn(spark, dir))
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Double]("mean_token_idf"))).toMap
    assert(out("A") == ((2L, 2L, 0.0))) // every token has idf ln(1)=0
    // B: one ln(4) token over 3 tokens = 0.462098 on the 1e-6 grid
    assert(out("B") == ((2L, 3L, 0.462098)))
  }

  test("degree histogram: bit-length buckets split the known graph") {
    val dir =
      java.nio.file.Files.createTempDirectory("mining_fix").toString
    // edges (1,2) and (1,3), both support 2: deg(1)=2, deg(2)=deg(3)=1
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 3L), (4L, 1L), (4L, 3L))
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val out = rows(graft.queries.Mining.q228.fn(spark, dir))
      .map(r => r.getAs[Long]("bucket_bits") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("min_deg"),
          r.getAs[Long]("max_deg"), r.getAs[Double]("node_share")))
      .toMap
    assert(out(1L) == ((2L, 1L, 1L, 0.666667)))
    assert(out(2L) == ((1L, 2L, 2L, 0.333333)))
    graft.operators.SharedFrames.release()
  }

  // ------------------------------------------------------------ tfidf

  test("tfidf: identical docs hit cosine 1.0, disjoint docs absent") {
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana cherry"),
      (3L, "dog elephant fox"))
      .toDF("id", "text")
    val out = rows(TfIdf.cosinePairs(docs, "id", "text", 10, 1000, 0.1))
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("cosine")))
    assert(out == Seq((1L, 2L, 1.0)))
  }
}
