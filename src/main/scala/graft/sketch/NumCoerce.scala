package graft.sketch

/** One numeric-coercion rule for the quantile sketch aggregates
  * ([[KllSketchAgg]], [[TDigestAgg]]) so they cannot drift apart: values
  * out of `child.eval(InternalRow)` arrive as Spark INTERNAL types — in
  * particular decimals are `org.apache.spark.sql.types.Decimal`, never
  * `java.math.BigDecimal` — and everything coerces to the double the
  * sketch updates with. ([[ThetaSketchAgg]] deliberately does NOT use
  * this: distinct-count identity keeps integral and floating families
  * separate.) */
private[sketch] object NumCoerce {
  def toDouble(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.toString.toDouble
  }
}
