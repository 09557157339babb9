package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's DataFrame API lacks as primitives:
  * backward as-of join and interval (range) containment join.
  *
  * Both are written for the 100 TB shape, not the small-n shape:
  *
  *  - [[asofJoin]] is union-and-forward-fill: ONE hash shuffle on the key,
  *    then a per-key window. The naive formulation (`l JOIN r ON l.k = r.k
  *    AND l.ts >= r.ts` + max-per-row) plans as an equi-join whose output
  *    explodes to O(|matches|²) per key before the aggregate; at corpus
  *    scale a hot key melts an executor. The window form's state is one
  *    row, and the sort it needs is the same local sort the shuffle
  *    already pays for.
  *
  *  - [[rangeJoin]] buckets time so containment becomes an EQUI-join.
  *    Spark plans a raw `BETWEEN` join predicate with no equality part as
  *    BroadcastNestedLoopJoin (driver-bound) or CartesianProduct — both
  *    non-starters at scale. Bucketing gives Catalyst a shuffle key; the
  *    residual BETWEEN stays as a cheap post-join filter.
  */
object TemporalJoins {

  /** Backward as-of join: for each left row, attach the single right row
    * with the greatest `rightTsCol` ≤ `leftTsCol` within the same key —
    * optionally only if it is at most `toleranceMicros` old.
    *
    * Timestamps are integral (micros since epoch or any monotone long);
    * both ts columns are cast to long. The right side must be unique per
    * (key, ts) — pre-aggregate if it is not (with ties the winner would be
    * partition-order-dependent, which this operator refuses to be; the
    * requirement is asserted cheaply per window frame, not with an extra
    * pass).
    *
    * Output: every left row/column, plus `matched_<rightTsCol>` (the
    * matched right timestamp, null if no match in range) and each of
    * `valueCols` taken verbatim from the matched right row — including
    * its genuine nulls: the fill carries the whole matched row as ONE
    * struct, so a null value on the matched row is preserved rather than
    * skipped back to an older row.
    *
    * Plan: union both sides → one hashpartitioning exchange on `keyCol` →
    * window ordered by (ts, side) with right rows (side 0) sorting before
    * left rows (side 1) at equal ts, so ties match (ASOF `>=` semantics,
    * same as DuckDB's `ASOF LEFT JOIN ... ON l.ts >= r.ts`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String, valueCols: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val matchedTs = s"matched_$rightTsCol"
    require(valueCols.nonEmpty, "asofJoin needs at least one value column")
    require(!left.columns.contains(matchedTs) &&
      valueCols.forall(v => !left.columns.contains(v)),
      s"left side must not already have $matchedTs or value columns $valueCols")
    toleranceMicros.foreach(t => require(t >= 0, s"negative tolerance $t"))

    val rSide = right.select(
      col(keyCol).as("__k"), lit(0).as("__side"),
      col(rightTsCol).cast("long").as("__ts"),
      struct(col(rightTsCol).cast("long").as("__rts") +: valueCols.map(col): _*)
        .as("__r"))
    val rType = rSide.schema("__r").dataType
    val lSide = left.select(
      col(keyCol).as("__k"), lit(1).as("__side"),
      col(leftTsCol).cast("long").as("__ts"),
      lit(null).cast(rType).as("__r"),
      struct(left.columns.map(col): _*).as("__l"))

    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__side"))
    val frame = w.rowsBetween(Window.unboundedPreceding, 0)
    val filled = lSide
      .unionByName(rSide.withColumn("__l",
        lit(null).cast(lSide.schema("__l").dataType)), allowMissingColumns = false)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(frame))
      // (key, ts)-uniqueness of the right side, asserted in-plan: a right
      // row whose immediate predecessor in the (ts, side) order is another
      // right row at the same ts is a duplicate. The flag is spread over
      // the whole partition (full-frame max, same sort/exchange) because
      // the surviving LEFT rows are the ones that must raise — the dup
      // right rows themselves are filtered out before evaluation.
      .withColumn("__dup",
        when(col("__side") === 0 && lag("__side", 1).over(w) === 0 &&
          lag("__ts", 1).over(w) === col("__ts"), 1).otherwise(0))
      .withColumn("__anyDup", max(col("__dup")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val checked = filled.withColumn("__m",
      when(col("__anyDup") === 1,
        raise_error(lit(s"asofJoin: right side not unique per ($keyCol, $rightTsCol)")))
        .otherwise(col("__m")))
    val inRange = toleranceMicros match {
      case Some(t) => col("__m").isNotNull && col("__ts") - col("__m.__rts") <= t
      case None    => col("__m").isNotNull
    }
    val leftRows = checked.filter(col("__side") === 1)
      .withColumn("__m", when(inRange, col("__m")))
    leftRows.select(
      left.columns.map(c => col(s"__l.$c").as(c)) ++
        (col("__m.__rts").as(matchedTs) +:
          valueCols.map(v => col(s"__m.$v").as(v))): _*)
  }

  /** Interval containment join: every (point, interval) pair on the same
    * key with `iStartCol <= pTsCol <= iEndCol` (both ends inclusive).
    * Intervals with end < start are dropped. Timestamps integral, as in
    * [[asofJoin]].
    *
    * `bucketMicros` trades shuffle width for interval fan-out: each
    * interval is replicated into `(len / bucketMicros) + 1` buckets, each
    * point into exactly ONE — so output pairs are unique without a
    * dedup, and the join is a plain equi-join on (key, bucket) that AQE
    * can re-plan like any other. Pick it near the typical interval
    * length. Bucketing uses floor division (pmod-based), so negative
    * timestamps bucket correctly too.
    *
    * Output columns: all point columns, then all interval columns (names
    * must be disjoint).
    */
  def rangeJoin(points: DataFrame, pKey: String, pTsCol: String,
      intervals: DataFrame, iKey: String, iStartCol: String, iEndCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    require(points.columns.intersect(intervals.columns).isEmpty,
      "point and interval column names must be disjoint")
    // integral `div`, NOT Column./ (double division): doubles are exact only
    // below 2^53, and the contract is "micros since epoch or any monotone
    // long" — a float path would silently mis-bucket large keys
    def bucket(name: String): Column = expr(
      s"(cast(`$name` as bigint) - pmod(cast(`$name` as bigint), ${bucketMicros}L))" +
        s" div ${bucketMicros}L")

    val pts = points.withColumn("__pb", bucket(pTsCol))
    val ivs = intervals
      .filter(col(iEndCol).cast("long") >= col(iStartCol).cast("long"))
      .withColumn("__ib", explode(sequence(
        bucket(iStartCol), bucket(iEndCol))))
    pts.join(ivs,
        pts("__pb") === ivs("__ib") && pts(pKey) === ivs(iKey) &&
          pts(pTsCol).cast("long").between(
            ivs(iStartCol).cast("long"), ivs(iEndCol).cast("long")))
      .drop("__pb", "__ib")
  }

  /** Interval OVERLAP join: every (left, right) interval pair on the same
    * key with `lStart <= rEnd && rStart <= lEnd` (closed intervals) — the
    * session-vs-incident / outage-vs-deploy join shape that a naive plan
    * turns into a per-key cross product. Degenerate intervals (end <
    * start) are dropped on both sides.
    *
    * Scale shape: BOTH sides replicate into the `bucketUnits`-wide buckets
    * their interval covers and the join is a plain equi-join on
    * (key, bucket) + the exact overlap predicate. A pair overlapping
    * several shared buckets would emit once per bucket, so each pair is
    * EMITTED EXACTLY ONCE, in the bucket holding `max(lStart, rStart)` —
    * the standard one-bucket-owns-the-pair rule; no distinct pass, no
    * wide dedup shuffle. Long intervals fan out into len/bucket copies:
    * pick `bucketUnits` near the typical interval length, and cap or
    * split pathological intervals upstream.
    *
    * Output columns: all left columns then all right columns (names must
    * be disjoint). Timestamps integral longs, as in [[asofJoin]].
    */
  def intervalOverlapJoin(left: DataFrame, lKey: String, lStartCol: String,
      lEndCol: String, right: DataFrame, rKey: String, rStartCol: String,
      rEndCol: String, bucketUnits: Long): DataFrame = {
    require(bucketUnits > 0, s"bucketUnits must be positive: $bucketUnits")
    require(left.columns.intersect(right.columns).isEmpty,
      "left and right column names must be disjoint")
    // integral `div` by column NAME (Column./ is double division — exact
    // only below 2^53; the contract is any monotone long)
    def bucket(name: String): Column = expr(
      s"(cast(`$name` as bigint) - pmod(cast(`$name` as bigint), ${bucketUnits}L))" +
        s" div ${bucketUnits}L")
    def covered(df: DataFrame, s: String, e: String,
        b: String, sb: String): DataFrame =
      df.filter(col(e).cast("long") >= col(s).cast("long"))
        .withColumn(sb, bucket(s))
        .withColumn(b, explode(sequence(col(sb), bucket(e))))
    val l = covered(left, lStartCol, lEndCol, "__lb", "__lsb")
    val r = covered(right, rStartCol, rEndCol, "__rb", "__rsb")
    l.join(r,
        l("__lb") === r("__rb") && l(lKey) === r(rKey) &&
          l(lStartCol).cast("long") <= r(rEndCol).cast("long") &&
          r(rStartCol).cast("long") <= l(lEndCol).cast("long") &&
          // exactly-once: only the bucket containing the later start owns
          // the pair; bucket() is monotone, so bucket(max(ls, rs)) =
          // max(bucket(ls), bucket(rs)) — no cross-side recompute
          l("__lb") === greatest(l("__lsb"), r("__rsb")))
      .drop("__lb", "__rb", "__lsb", "__rsb")
  }
}
