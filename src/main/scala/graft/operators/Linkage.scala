package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: fuzzy-match two relations on a
  * string key without ever forming the all-pairs product.
  *
  * The classic two-phase shape: (1) BLOCKING — both sides compute a
  * deterministic block key (a cheap canonical projection of the match
  * column: length, a stable substring, a phonetic code); candidates
  * are an equi join on the block, exactly how LSH banding bounds
  * minhash candidate pairs. (2) VERIFY — exact edit distance on the
  * candidates only. At 100 TB the block join shuffles on a short
  * string and the quadratic-cost `levenshtein` runs on the bounded
  * in-block pairs, never on the cross product.
  *
  * Recall contract: a pair is found iff its two values agree on the
  * block key — the caller picks a block function that is invariant
  * under the corruption they hunt (e.g. a substring that skips the
  * positions typos occupy), the same trade LSH makes. */
object Linkage {

  /** Blocked fuzzy join. Returns the candidate pairs that verify at
    * `levenshtein <= maxDist`, with the distance as `__dist`. Column
    * names of `left` and `right` must be disjoint; the block key is
    * derived from each side's match column via `blockOf`. */
  def fuzzyJoin(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      blockOf: Column => Column, maxDist: Int): DataFrame =
    left.withColumn("__blk", blockOf(col(leftKey)))
      .join(right.withColumn("__blk", blockOf(col(rightKey))), "__blk")
      .withColumn("__dist", levenshtein(col(leftKey), col(rightKey)))
      .filter(col("__dist") <= maxDist)
      .drop("__blk")

  /** Value-level blocked fuzzy join — the skew-proof form. Both sides
    * are first collapsed to DISTINCT values with multiplicities
    * (`__ln`, `__rn`), so the quadratic `levenshtein` runs once per
    * distinct value PAIR, not once per row pair: a column with v
    * distinct values over n rows pays ≤ (in-block) v² comparisons
    * instead of n². Row-level statistics are recovered exactly as
    * weighted sums (`__ln · __rn` row pairs per value pair). This is
    * the dedupe-before-compare rule every entity-resolution engine
    * applies when match columns are heavily repeated — precisely when
    * blocked joins blow up. */
  def fuzzyJoinValues(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String,
      blockOf: Column => Column, maxDist: Int): DataFrame =
    fuzzyJoin(
      left.groupBy(col(leftKey)).agg(count(lit(1)).as("__ln")), leftKey,
      right.groupBy(col(rightKey)).agg(count(lit(1)).as("__rn")), rightKey,
      blockOf, maxDist)
}
