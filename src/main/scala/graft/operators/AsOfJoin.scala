package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime within the same key group (backward direction —
  * the standard event-attribution / point-in-time-lookup operator, which
  * Spark SQL lacks natively).
  *
  * Implementation: tag + union both sides, hash-partition by key, sort each
  * group by (time, side) once, and sweep — one pass per group, O(n log n)
  * total, no range-join candidate blowup (a naive `l.ts >= r.ts` theta join
  * materializes O(|L|·|R|) pairs per key before ranking). This is the
  * composition path (preference order (a) in the project brief): groupByKey +
  * flatMapGroups over a declared shuffle, no custom SparkPlan needed.
  *
  * Scale: one shuffle of each side by key; per-key state is one "current
  * right row" during the sweep. Skewed keys sort within a single task —
  * for pathological single-key skew, pre-bucket by coarse time range.
  */
object AsOfJoin {

  /** Forward direction: earliest right row with rightTime >= leftTime. */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTimeCol: String, rightTimeCol: String,
                  rightPrefix: String = "r_",
                  toleranceMicros: Long = Long.MaxValue): DataFrame =
    asofJoin(left, right, keyCol, leftTimeCol, rightTimeCol, rightPrefix,
      forward = true, toleranceMicros)

  /** @param rightPrefix prefix for right-side output columns (all right
    *   columns appear, nullable, prefixed to avoid collisions).
    * @param toleranceMicros max |leftTime - rightTime| for a match; beyond
    *   it the right side is null (like pandas merge_asof's tolerance). */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTimeCol: String, rightTimeCol: String,
                   rightPrefix: String = "r_",
                   toleranceMicros: Long = Long.MaxValue): DataFrame =
    asofJoin(left, right, keyCol, leftTimeCol, rightTimeCol, rightPrefix,
      forward = false, toleranceMicros)

  private def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTimeCol: String, rightTimeCol: String,
                       rightPrefix: String, forward: Boolean,
                       toleranceMicros: Long): DataFrame = {
    val spark = left.sparkSession
    val leftFields = left.schema.fields
    val rightFields = right.schema.fields
    val outSchema = StructType(
      leftFields ++ rightFields.map(f =>
        StructField(rightPrefix + f.name, f.dataType, nullable = true)))

    val lTagged = left.select(
      col(keyCol).as("k"),
      unix_micros(col(leftTimeCol).cast("timestamp")).as("t"),
      lit(1).as("side"),
      struct(leftFields.map(f => col(f.name)): _*).as("lrow"),
      lit(null).cast(StructType(rightFields)).as("rrow"))
    val rTagged = right.select(
      col(keyCol).as("k"),
      unix_micros(col(rightTimeCol).cast("timestamp")).as("t"),
      lit(0).as("side"),
      lit(null).cast(StructType(leftFields)).as("lrow"),
      struct(rightFields.map(f => col(f.name)): _*).as("rrow"))

    // Null-key RIGHT rows can never match (SQL null-join semantics) — drop
    // them up front so null-key left rows (grouped under a sentinel) always
    // get a null right side rather than matching each other.
    val union = lTagged.unionByName(
      rTagged.filter(org.apache.spark.sql.functions.col("k").isNotNull))

    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)

    // Canonical string encoding per key value: Array[Byte].toString is
    // identity-based (equal binary keys would land in DIFFERENT groups and
    // silently lose matches), so byte-array keys are hex-encoded; everything
    // else round-trips through toString, which is value-based for the
    // remaining atomic Catalyst external types.
    val grouped = union.groupByKey((r: Row) => r.getAs[Any]("k") match {
      case null => "\u0000" // sentinel group: contains only null-key left rows
      case b: Array[Byte] =>
        val sb = new StringBuilder("b:")
        b.foreach(x => sb.append(f"${x & 0xff}%02x"))
        sb.toString
      case v => "v:" + v.toString
    })(org.apache.spark.sql.Encoders.STRING)

    val nullRight: Seq[Any] = Seq.fill(rightFields.length)(null)
    grouped.flatMapGroups { (_: String, rows: Iterator[Row]) =>
      // Sort so that, in sweep order, right rows at equal time are seen
      // before the left rows they may match (inclusive boundary).
      val sorted = rows.toArray.sortBy { r =>
        val t = if (r.isNullAt(1)) Long.MinValue else r.getLong(1)
        val side = r.getInt(2) // 0 = right, 1 = left
        (t, if (forward) 1 - side else side)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      var current: Row = null
      var currentT = 0L
      val range = if (forward) sorted.indices.reverse else sorted.indices
      for (i <- range) {
        val r = sorted(i)
        val tNull = r.isNullAt(1)
        if (r.getInt(2) == 0) {
          // right row with null time can never satisfy the as-of predicate
          if (!tNull) { current = r.getStruct(4); currentT = r.getLong(1) }
        } else {
          val l = r.getStruct(3)
          val rightVals =
            if (tNull || current == null) nullRight
            else {
              val lt = r.getLong(1)
              val gap = if (forward) currentT - lt else lt - currentT
              if (gap <= toleranceMicros) current.toSeq else nullRight
            }
          out += Row.fromSeq(l.toSeq ++ rightVals)
        }
      }
      out.iterator
    }(outEnc)
  }
}
