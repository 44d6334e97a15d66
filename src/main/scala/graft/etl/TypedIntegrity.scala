package graft.etl

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-Dataset surface for the integrity metrics: a single custom
  * `Aggregator[WeatherObservation, _, _]` so `Dataset[WeatherObservation]`
  * users get the audit as one typed column — same partial+final merge
  * shape as the untyped [[IntegrityReport.aggregated]] plan.
  *
  * The buffer is a flat case class (tuple encoder, Tungsten-backed);
  * merge is associative+commutative, so Spark runs it map-side first.
  */
object TypedIntegrity {

  final case class Buf(
      total: Long,
      nullTemp: Long,
      nullHum: Long,
      minDate: String,
      maxDate: String)

  final case class Stats(
      totalRows: Long,
      nullTemperature: Long,
      nullHumidity: Long,
      minDate: Option[String],
      maxDate: Option[String])

  private def minS(a: String, b: String): String =
    if (a == null) b else if (b == null) a else if (a <= b) a else b
  private def maxS(a: String, b: String): String =
    if (a == null) b else if (b == null) a else if (a >= b) a else b

  val aggregator: Aggregator[WeatherObservation, Buf, Stats] =
    new Aggregator[WeatherObservation, Buf, Stats] {
      override def zero: Buf = Buf(0L, 0L, 0L, null, null)
      override def reduce(b: Buf, o: WeatherObservation): Buf = Buf(
        b.total + 1,
        b.nullTemp + (if (o.temperature_c.isEmpty) 1 else 0),
        b.nullHum + (if (o.humidite_pct.isEmpty) 1 else 0),
        minS(b.minDate, o.date_heure_utc),
        maxS(b.maxDate, o.date_heure_utc))
      override def merge(a: Buf, b: Buf): Buf = Buf(
        a.total + b.total, a.nullTemp + b.nullTemp, a.nullHum + b.nullHum,
        minS(a.minDate, b.minDate), maxS(a.maxDate, b.maxDate))
      override def finish(b: Buf): Stats =
        Stats(b.total, b.nullTemp, b.nullHum, Option(b.minDate), Option(b.maxDate))
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }

  def compute(ds: Dataset[WeatherObservation]): Stats =
    ds.select(aggregator.toColumn).head()
}
