package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC changelog apply: materialize the current snapshot from a base
  * table plus an insert/update/delete change stream — the MERGE-shaped
  * warehouse primitive next to SCD2 ([[Scd2.merge]] keeps history;
  * this keeps only current state). Semantics: per key, the
  * highest-`seq` record wins; a winning `D` removes the key; a `U`/`I`
  * on an absent key upserts it (op codes carry no precedence — the
  * sequence number is the total order, dbt snapshot / Delta CDF
  * convention). Callers must guarantee `seq` is unique per key (base
  * rows enter at seq = -1).
  *
  * Scale design (100 TB): ONE shuffle by key over base ∪ changelog,
  * and the reducer is `max(struct(seq, …))` — partial-aggregatable
  * (map-side combine), so a key with a million change rows sends one
  * row per map partition, not a sorted window. No driver state, no
  * collect; compose with [[graft.sources.Materialize.tableIncremental]]
  * to restrict the rewrite to touched partitions.
  */
object Cdc {

  /** Apply `changelog` (key + `seqCol` + `opCol` ∈ {I,U,D} + payload)
    * to `base` (key + payload, treated as seq = -1 inserts). Returns
    * the applied snapshot: key, payload, plus `last_seq` (the winning
    * sequence, -1 = untouched base row) and `n_ops` (changelog rows
    * seen for the key). Payload columns are `base`'s non-key columns
    * and must exist in both inputs. */
  def apply(base: DataFrame, changelog: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    def versioned(df: DataFrame, seq: Column, op: Column,
        nOps: Column): DataFrame =
      df.select(
        keyCols.map(col) ++ Seq(
          struct(
            seq.cast("long").as("__seq") +:
              op.as("__op") +:
              payload.map(col): _*).as("__v"),
          nOps.as("__n")): _*)
    versioned(base, lit(-1L), lit("I"), lit(0L))
      .unionByName(versioned(changelog, col(seqCol), col(opCol), lit(1L)))
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("__v")).as("__w"), sum(col("__n")).as("n_ops"))
      .filter(col("__w.__op") =!= "D")
      .select(keyCols.map(col) ++
        payload.map(p => col(s"__w.$p").as(p)) ++
        Seq(col("__w.__seq").as("last_seq"), col("n_ops")): _*)
  }

  /** Survivorship merge (the MDM "golden record"): several source
    * records per key, each with its own `seqCol` recency and partial
    * (nullable) fields — the golden record takes, PER FIELD, the value
    * from the most recent record where that field is non-null
    * (`max_by(field, seq-if-present)`; both Spark's `max_by` and SQL
    * `arg_max` skip rows whose ordering value is null, which is
    * exactly the survivorship rule). A field null in every record
    * stays null. One shuffle, partial-aggregatable — a key with a
    * thousand source records sends one candidate per field per map
    * partition. */
  def survivorship(records: DataFrame, keyCols: Seq[String],
      seqCol: String): DataFrame = {
    val payload = records.columns
      .filterNot(c => keyCols.contains(c) || c == seqCol).toSeq
    records.groupBy(keyCols.map(col): _*)
      .agg(
        max_by(col(payload.head),
          when(col(payload.head).isNotNull, col(seqCol)))
          .as(payload.head),
        payload.tail.map(p =>
          max_by(col(p), when(col(p).isNotNull, col(seqCol))).as(p)) ++
          Seq(count(lit(1)).as("n_records"),
            max(col(seqCol)).cast("long").as("last_seq")): _*)
  }
}
