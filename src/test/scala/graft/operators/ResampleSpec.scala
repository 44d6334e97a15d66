package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("LOCF grid: aligned buckets, carried values, pre-first-obs nulls") {
    val obs = Seq(
      (1L, 103L, 10.0), (1L, 205L, 20.0), (1L, 450L, 45.0),
      (2L, 999L, 9.9)
    ).toDF("k", "ts", "v")
    val got = Resample.locf(obs, "k", "ts", "v", step = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // key 1: grid 100..450 step 100 → 100,200,300,400
    assert(got((1L, 100L)).isEmpty)          // before first obs @103
    assert(got((1L, 200L)).contains(10.0))   // obs@103 carried
    assert(got((1L, 300L)).contains(20.0))   // obs@205 carried
    assert(got((1L, 400L)).contains(20.0))   // still carried
    assert(!got.contains((1L, 500L)))        // grid ends at max ts 450
    // key 2: single grid point at 900, before obs @999 → null
    assert(got((2L, 900L)).isEmpty)
    assert(got.size == 5)
  }

  test("ohlcBars: open/close follow (ts,id) order, not value order") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val hourUs = 3600000000L
    // one bucket: values 5 (t=0), 9 (t=1), 2 (t=2), 7 (t=3)
    // second bucket (hour 2): single event 4
    val df = Seq(
      (1L, 1L, ts(0), 5.0), (1L, 2L, ts(1), 9.0),
      (1L, 3L, ts(2), 2.0), (1L, 4L, ts(3), 7.0),
      (1L, 5L, ts(7200), 4.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Resample.ohlcBars(df, "user_id", "ts", "event_id", "value",
      bucketUs = hourUs).orderBy("bucket").collect()
    assert(out.length == 2)
    val b0 = out.head
    assert(b0.getAs[Double]("open") == 5.0 && b0.getAs[Double]("close") == 7.0)
    assert(b0.getAs[Double]("high") == 9.0 && b0.getAs[Double]("low") == 2.0)
    assert(b0.getAs[Long]("n_events") == 4L)
    assert(b0.getAs[Double]("total") == 23.0)
    // same-timestamp events fall back to the id tie-break
    val tie = Seq((1L, 2L, ts(0), 8.0), (1L, 1L, ts(0), 3.0))
      .toDF("user_id", "event_id", "ts", "value")
    val t0 = Resample.ohlcBars(tie, "user_id", "ts", "event_id", "value",
      bucketUs = hourUs).collect().head
    assert(t0.getAs[Double]("open") == 3.0 && t0.getAs[Double]("close") == 8.0)
  }
}
