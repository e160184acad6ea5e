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

  /** @param rightPrefix prefix for right-side output columns (all right
    *   columns appear, nullable, prefixed to avoid collisions). */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTimeCol: String, rightTimeCol: String,
                   rightPrefix: String = "r_"): DataFrame = {
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

    val union = lTagged.unionByName(rTagged)

    val outEnc = org.apache.spark.sql.Encoders.row(outSchema)

    val grouped = union.groupByKey((r: Row) => r.getAs[Any]("k") match {
      case null => "" // null keys join nothing but must not NPE
      case v => v.toString
    })(org.apache.spark.sql.Encoders.STRING)

    grouped.flatMapGroups { (_: String, rows: Iterator[Row]) =>
      val sorted = rows.toArray.sortBy(r =>
        (if (r.isNullAt(1)) Long.MinValue else r.getLong(1), r.getInt(2)))
      var current: Row = null
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      for (r <- sorted) {
        if (r.getInt(2) == 0) current = r.getStruct(4)
        else {
          val l = r.getStruct(3)
          val rightVals: Seq[Any] =
            if (current == null) Seq.fill(rightFields.length)(null)
            else current.toSeq
          out += Row.fromSeq(l.toSeq ++ rightVals)
        }
      }
      out.iterator
    }(outEnc)
  }
}
