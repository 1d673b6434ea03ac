package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` form of the Gold computation — the type-safe API
  * surface (`Dataset.groupByKey(...).agg(PowerAggregator.toColumn)`)
  * beside the untyped pivot in [[graft.pipeline.SensorPipeline]].
  *
  * Buffer carries (sumV, nV, sumI, nI); merge is associative/commutative
  * so Spark runs it map-side partial like any built-in aggregate. Finish
  * = avg(V)·avg(I), NaN when either side is empty (caller filters,
  * mirroring the reference's both-present guard, mart_daily_power.sql:65-68).
  */
object PowerAggregator extends Aggregator[(String, Double), (Double, Long, Double, Long), Double] {

  override def zero: (Double, Long, Double, Long) = (0.0, 0L, 0.0, 0L)

  override def reduce(b: (Double, Long, Double, Long), a: (String, Double)): (Double, Long, Double, Long) =
    a._1 match {
      case "Voltage" => (b._1 + a._2, b._2 + 1, b._3, b._4)
      case "Current" => (b._1, b._2, b._3 + a._2, b._4 + 1)
      case _ => b
    }

  override def merge(x: (Double, Long, Double, Long), y: (Double, Long, Double, Long)): (Double, Long, Double, Long) =
    (x._1 + y._1, x._2 + y._2, x._3 + y._3, x._4 + y._4)

  override def finish(r: (Double, Long, Double, Long)): Double =
    if (r._2 == 0 || r._4 == 0) Double.NaN
    else (r._1 / r._2) * (r._3 / r._4)

  override def bufferEncoder: Encoder[(Double, Long, Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
