package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark has no built-in operator for: as-of (most
  * recent match at-or-before) and banded range (point-in-interval)
  * joins. Both are composed from existing relational operators so
  * Catalyst keeps optimizing around them — no custom physical operator
  * is needed because the SEMANTICS decompose into shuffle-by-key +
  * sort / equality-join shapes Spark already executes well.
  *
  * Scale design:
  *   - `asofJoin` is ONE shuffle by key + ONE per-partition sort (the
  *     union-and-carry-forward formulation). The naive alternative — a
  *     non-equi theta join `r.ts <= l.ts` + max-per-left aggregation —
  *     builds an O(|L|·|R|/keys) intermediate that dies at scale;
  *     this plan never materializes more than |L| + |R| rows.
  *   - `rangeJoin` blocks intervals onto fixed-width time buckets: an
  *     interval covers ceil(len/width)+1 buckets, a point exactly one,
  *     so candidates come from an EQUALITY join on (key, bucket) — the
  *     same blocking discipline as the dedup family (never enumerate
  *     the cross space, let AQE split skewed buckets).
  */
object TemporalJoins {

  /** As-of join: for every left row, the single right row with the same
    * `keys` and the greatest `rightTime` ≤ `leftTime` (inclusive).
    * Right-side payload columns come back null when no right row
    * precedes the left row.
    *
    * Mechanics (public "union trick" — e.g. pandas merge_asof's sorted
    * merge, expressed relationally): tag right rows side=0 and left rows
    * side=1, union, then per key sorted by (ts, side, tie) carry the
    * last non-null right payload forward with
    * `last_value(..., ignoreNulls)` over rows UNBOUNDED PRECEDING..
    * CURRENT. Right-before-left at equal ts makes the join inclusive;
    * `tie` makes the carried row deterministic when multiple right rows
    * share (key, ts) — the one with the LARGEST tie value wins (callers
    * wanting uniqueness should pre-aggregate the right side).
    *
    * `tolerance`: optional max age (e.g. `expr("INTERVAL 1 HOUR")`); an
    * older match is nulled out, like pandas' merge_asof tolerance.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightTie: Option[String] = None,
      tolerance: Option[Column] = None): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    require((left.columns.toSeq.filterNot(keys.contains))
        .intersect(rightPayload).isEmpty,
      s"left/right non-key columns must be disjoint: " +
        left.columns.toSeq.intersect(rightPayload).mkString(", "))
    val scratch = Seq("__ts", "__side", "__tie", "__rp")
    require((left.columns ++ right.columns).intersect(scratch).isEmpty,
      s"column names ${scratch.mkString("/")} are reserved by asofJoin")
    require(rightPayload.nonEmpty, "right side needs at least one payload column")
    // The left time column travels as __ts (and is restored at the end);
    // remaining left payload is carried through the union untouched.
    val leftPayload = left.columns
      .filterNot(keys.contains).filterNot(_ == leftTime).toSeq
    val tieCol = rightTie.map(col).getOrElse(
      // Deterministic fallback tie-break: hash of the whole right payload.
      xxhash64(rightPayload.map(col): _*))

    // The right payload travels as ONE struct: `last(..., ignoreNulls)`
    // then carries whole right ROWS atomically — per-column carries
    // would stitch together cells from different right rows whenever a
    // payload cell is null.
    val rpType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val lPart = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__ts"), lit(1).as("__side"), lit(0L).as("__tie"),
          lit(null).cast(rpType).as("__rp")) ++
        leftPayload.map(col): _*)
    // A right row with a NULL time can never be an as-of match — but
    // under NULLS FIRST it would sort before the whole partition and be
    // carried into every left row. Drop such rows up front. (A NULL
    // LEFT time also sorts first, sees no preceding right row, and
    // correctly gets a null match — no filter needed on that side.)
    val rPart = right.where(col(rightTime).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTime).cast(left.schema(leftTime).dataType).as("__ts"),
          lit(0).as("__side"), tieCol.cast("long").as("__tie"),
          struct(rightPayload.map(col): _*).as("__rp")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lPart.unionByName(rPart)
      .select(
        (keys.map(col) ++ Seq(col("__ts"), col("__side")) ++ leftPayload.map(col) :+
          last(col("__rp"), ignoreNulls = true).over(w).as("__rp")): _*)
      .where(col("__side") === 1)

    val masked = tolerance match {
      case Some(tol) =>
        // A match older than the tolerance is no match: null the payload.
        val fresh = col("__rp").isNotNull &&
          col("__rp").getField(rightTime) >= (col("__ts") - tol)
        carried.withColumn("__rp", when(fresh, col("__rp")))
      case None => carried
    }
    masked.withColumnRenamed("__ts", leftTime)
      .select((keys ++ (leftTime +: leftPayload)).map(col) ++
        rightPayload.map(c => col("__rp").getField(c).as(c)): _*)
  }

  /** Nearest-neighbor as-of join: for every left row, the single right
    * row with the same `keys` whose `rightTime` is CLOSEST in either
    * direction, within `tolerance`; equidistant candidates resolve to
    * the EARLIER right row (the pandas `merge_asof(direction='nearest')`
    * semantics). Same one-shuffle union trick as [[asofJoin]], with TWO
    * carries over the one sorted pass: `last_value(…, ignoreNulls)` over
    * UNBOUNDED PRECEDING..CURRENT (the at-or-before match) and
    * `first_value(…, ignoreNulls)` over 1 FOLLOWING..UNBOUNDED (the
    * strictly-after match; an equal-ts right sorts BEFORE the left row,
    * so it is already the backward match at distance 0). No theta join,
    * no per-row candidate scan.
    *
    * Ties among right rows sharing (key, ts): backward keeps the
    * largest `rightTie`, forward the smallest — pre-aggregate the right
    * side to one row per (key, ts) when that asymmetry matters.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, tolerance: Column,
      rightTie: Option[String] = None): DataFrame = {
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
    require((left.columns.toSeq.filterNot(keys.contains))
        .intersect(rightPayload).isEmpty,
      s"left/right non-key columns must be disjoint: " +
        left.columns.toSeq.intersect(rightPayload).mkString(", "))
    val scratch = Seq("__ts", "__side", "__tie", "__rp", "__prev", "__next")
    require((left.columns ++ right.columns).intersect(scratch).isEmpty,
      s"column names ${scratch.mkString("/")} are reserved by asofNearest")
    require(rightPayload.nonEmpty, "right side needs at least one payload column")
    val leftPayload = left.columns
      .filterNot(keys.contains).filterNot(_ == leftTime).toSeq
    val tieCol = rightTie.map(col).getOrElse(
      xxhash64(rightPayload.map(col): _*))
    val rpType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))
    val lPart = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__ts"), lit(1).as("__side"), lit(0L).as("__tie"),
          lit(null).cast(rpType).as("__rp")) ++
        leftPayload.map(col): _*)
    val rPart = right.where(col(rightTime).isNotNull).select(
      keys.map(col) ++
        Seq(col(rightTime).cast(left.schema(leftTime).dataType).as("__ts"),
          lit(0).as("__side"), tieCol.cast("long").as("__tie"),
          struct(rightPayload.map(col): _*).as("__rp")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = ord.rowsBetween(1, Window.unboundedFollowing)
    val carried = lPart.unionByName(rPart)
      .select(
        (keys.map(col) ++ Seq(col("__ts"), col("__side")) ++ leftPayload.map(col) ++
          Seq(last(col("__rp"), ignoreNulls = true).over(wPrev).as("__prev"),
            first(col("__rp"), ignoreNulls = true).over(wNext).as("__next"))): _*)
      .where(col("__side") === 1)

    def ts(c: Column): Column = unix_micros(c.getField(rightTime))
    // Tolerance is applied in timestamp space (like asofJoin): a
    // candidate farther than `tolerance` from the left time is no match.
    val prevOk = col("__prev").isNotNull &&
      col("__prev").getField(rightTime) >= (col("__ts") - tolerance)
    val nextOk = col("__next").isNotNull &&
      col("__next").getField(rightTime) <= (col("__ts") + tolerance)
    val prevDiff = unix_micros(col("__ts")) - ts(col("__prev"))
    val nextDiff = ts(col("__next")) - unix_micros(col("__ts"))
    val picked = carried.withColumn("__rp",
      when(prevOk && (!nextOk || prevDiff <= nextDiff), col("__prev"))
        .when(nextOk, col("__next")))
    picked.withColumnRenamed("__ts", leftTime)
      .select((keys ++ (leftTime +: leftPayload)).map(col) ++
        rightPayload.map(c => col("__rp").getField(c).as(c)): _*)
  }

  /** Banded range join: all (left, right) pairs with equal `keys` and
    * `rStart <= leftTime <= rEnd`, via fixed-width time-bucket blocking.
    *
    * `bucketWidthUs` must be chosen ≥ the TYPICAL interval length: an
    * interval explodes to `len/width + 1` bucket keys, a left point to
    * exactly ONE, so pair candidates only materialize for buckets where
    * both sides collide — and because the point side carries a single
    * bucket, no candidate pair is generated twice (no distinct pass).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rStart: String, rEnd: String,
      bucketWidthUs: Long): DataFrame = {
    require(bucketWidthUs > 0, "bucketWidthUs must be positive")
    val lb = left.withColumn("__bkt",
      floor(unix_micros(col(leftTime)) / bucketWidthUs))
    val rb = right.withColumn("__bkt", explode(sequence(
      floor(unix_micros(col(rStart)) / bucketWidthUs),
      floor(unix_micros(col(rEnd)) / bucketWidthUs))))
    lb.join(rb, keys :+ "__bkt")
      .where(col(leftTime) >= col(rStart) && col(leftTime) <= col(rEnd))
      .drop("__bkt")
  }
}
