package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.CleanValue._

/** Table-driven over the exact suffix set of the reference's clean_value
  * (etl_meteo.py:41-46) — see SURVEY §5.2.
  */
class CleanValueSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(values: Seq[String]): Seq[Option[Double]] =
    values.toDF("v").select(cleanValue(col("v")).as("c"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("clean_value: unit suffixes, decimal comma, junk, null") {
    val cases: Seq[(String, Option[Double])] = Seq(
      "23,5 °F" -> Some(23.5),
      "55,6 °F" -> Some(55.6),
      "61 %" -> Some(61.0),
      "4,5 mph" -> Some(4.5),
      "29,82 in" -> Some(29.82),
      "0 w/m²" -> Some(0.0),
      "12.75" -> Some(12.75),
      "  7 " -> Some(7.0),
      "" -> None,
      "NaN" -> None,
      "N/A" -> None,
      "--" -> None,
      (null: String) -> None)
    val got = run(cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"cleanValue($in)")
    }
  }

  test("comma→dot runs before suffix strip (decimal-comma locale)") {
    // "1,5" must become 1.5, not 15
    assert(run(Seq("1,5")) == Seq(Some(1.5)))
  }

  test("unit conversions: closed-form values, null propagation") {
    val df = Seq(("32", "29.92", "10", "1", "36")).toDF("f", "inhg", "mph", "in", "kmh")
    val r = df.select(
      fahrenheitToCelsius(col("f").cast("double")).as("c"),
      inHgToHpa(col("inhg").cast("double")).as("hpa"),
      mphToMs(col("mph").cast("double")).as("ms"),
      inchesToMm(col("in").cast("double")).as("mm"),
      kmhToMs(col("kmh").cast("double")).as("kms")).head()
    assert(r.getDouble(0) === 0.0)
    assert(math.abs(r.getDouble(1) - 29.92 * 33.8638) < 1e-9)
    assert(math.abs(r.getDouble(2) - 4.4704) < 1e-9)
    assert(r.getDouble(3) === 25.4)
    assert(r.getDouble(4) === 10.0)
    val nulls = Seq(Option.empty[Double]).toDF("x")
      .select(fahrenheitToCelsius(col("x")).as("c")).head()
    assert(nulls.isNullAt(0))
  }

  test("numOrNull falsy gate: '' -> null, '0' -> 0.0, junk -> null") {
    val df = Seq(("", "0", "93", "junk")).toDF("a", "b", "c", "d")
    val r = df.select(numOrNull(col("a")), numOrNull(col("b")),
      numOrNull(col("c")), numOrNull(col("d"))).head()
    assert(r.isNullAt(0) && r.getDouble(1) == 0.0 && r.getDouble(2) == 93.0 && r.isNullAt(3))
  }

  test("kernel matches the regex formulation on adversarial strings") {
    // the executable spec: the exact regex chain the kernel replaced
    def regexForm(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val cleaned = regexp_replace(
        regexp_replace(c.cast("string"), ",", "."),
        "\\s|°F|mph|in|w/m²|%", "")
      when(cleaned.rlike("^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"),
        cleaned.cast("double"))
    }
    val tricky = Seq(
      // overlapping / partial suffix shapes
      "win", "min", "i n", "m p h", "5mphin", "2in", "1inin", "w/m", "w/m²",
      "°", "° F", "°F", "5°", "°F°F5", "w/m²w/m²7", "inw/m²",
      // numeric shapes the pattern must adjudicate
      "1,5", "1.5e-3", "+.5", "-.", "1.", ".e3", "1e", "1e+", "1E+4", "+",
      "-", ".", "..1", "1..2", "1,2,3", "0,0", "1e309", "-0",
      // junk / specials (parseDouble would accept some of these raw!)
      "NaN", "Infinity", "-Infinity", "0x1p3", "1d", "1f", "٥", "Ⅻ",
      // whitespace family (\t \n \x0B \f \r space) and mixes
      "\t1\n", "\u000B2\u000C", "\r3 ", " 1 , 5 %", "",
      // multi-byte neighbors that must survive
      "Å1", "1µ", "é", "1²", "²1")
    val df = tricky.toDF("v")
    val got = df.select(cleanValue(col("v")).as("k"), regexForm(col("v")).as("r"))
      .collect()
    tricky.zip(got).foreach { case (in, r) =>
      val k = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val rx = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(k == rx, s"cleanValue kernel vs regex diverged on '$in'")
    }
  }

  test("numOrZero: missing/''/null -> 0.0; junk -> null, never a fake 0") {
    val df = Seq((null.asInstanceOf[String], "", "14.8", "N/A"))
      .toDF("a", "b", "c", "d")
    val r = df.select(numOrZero(col("a")), numOrZero(col("b")),
      numOrZero(col("c")), numOrZero(col("d"))).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 14.8)
    // the reference's float("N/A") raises; coercing to 0 would record
    // a legitimate-looking measurement — null keeps it auditable
    assert(r.isNullAt(3))
  }
}
