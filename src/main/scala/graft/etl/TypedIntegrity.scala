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
      minEpochSec: Long,
      maxEpochSec: Long)

  final case class Stats(
      totalRows: Long,
      nullTemperature: Long,
      nullHumidity: Long,
      minDate: Option[String],
      maxDate: Option[String])

  private val formats = Seq(
    "yyyy-MM-dd H:mm:ss", "yyyy-MM-dd H:mm", "yyyy-MM-dd h:mm a")
    .map(java.time.format.DateTimeFormatter.ofPattern(_))

  /** Coercing multi-format parse — chronological semantics, same formats
    * as [[WeatherTransforms.parsedTimestampMulti]]; unparseable → None.
    */
  private[etl] def parseEpochSec(s: String): Option[Long] = {
    if (s == null) return None
    formats.view.flatMap { f =>
      try Some(java.time.LocalDateTime.parse(s, f)
        .toEpochSecond(java.time.ZoneOffset.UTC))
      catch { case _: java.time.format.DateTimeParseException => None }
    }.headOption
  }

  private def fmt(epochSec: Long): String =
    java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  val aggregator: Aggregator[WeatherObservation, Buf, Stats] =
    new Aggregator[WeatherObservation, Buf, Stats] {
      override def zero: Buf = Buf(0L, 0L, 0L, Long.MaxValue, Long.MinValue)
      override def reduce(b: Buf, o: WeatherObservation): Buf = {
        val ts = parseEpochSec(o.date_heure_utc)
        Buf(
          b.total + 1,
          b.nullTemp + (if (o.temperature_c.isEmpty) 1 else 0),
          b.nullHum + (if (o.humidite_pct.isEmpty) 1 else 0),
          math.min(b.minEpochSec, ts.getOrElse(Long.MaxValue)),
          math.max(b.maxEpochSec, ts.getOrElse(Long.MinValue)))
      }
      override def merge(a: Buf, b: Buf): Buf = Buf(
        a.total + b.total, a.nullTemp + b.nullTemp, a.nullHum + b.nullHum,
        math.min(a.minEpochSec, b.minEpochSec), math.max(a.maxEpochSec, b.maxEpochSec))
      override def finish(b: Buf): Stats = Stats(
        b.total, b.nullTemp, b.nullHum,
        if (b.minEpochSec == Long.MaxValue) None else Some(fmt(b.minEpochSec)),
        if (b.maxEpochSec == Long.MinValue) None else Some(fmt(b.maxEpochSec)))
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }

  def compute(ds: Dataset[WeatherObservation]): Stats =
    ds.select(aggregator.toColumn).head()
}
