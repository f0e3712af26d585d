package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DoubleType, FloatType,
  LongType, StringType}
import graft.etl.Precision

/** Layer float-precision policy (SURVEY §1.2; ref
  * transform/dtypes.py:11-45): Bronze=Float64 identity, Silver/Gold
  * downcast every DoubleType column to Float32 as a final projection,
  * leaving keys/ints/bools/strings untouched. */
class PrecisionSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    ("A", 1L, 1.0 / 3.0, 10L, true),
    ("B", 2L, 2.5, 20L, false))
    .toDF("ticker", "bar_ts", "ret_1d", "n", "flag")

  test("silver/gold cast doubles to float, leave other types alone") {
    for (layer <- Seq(Precision.SilverLayer, Precision.GoldLayer)) {
      val out = Precision.withPrecision(frame, layer)
      val types = out.schema.fields.map(f => f.name -> f.dataType).toMap
      assert(types("ret_1d") == FloatType)
      assert(types("ticker") == StringType)
      assert(types("bar_ts") == LongType)
      assert(types("n") == LongType)
      assert(types("flag") == BooleanType)
    }
  }

  test("bronze is the identity") {
    val out = Precision.withPrecision(frame, Precision.BronzeLayer)
    assert(out.schema == frame.schema)
    assert(out.schema("ret_1d").dataType == DoubleType)
  }

  test("values are IEEE round-to-nearest float32 of the double input") {
    val v = Precision.withPrecision(frame, Precision.SilverLayer)
      .orderBy("ticker").select("ret_1d").as[Float].collect()
    assert(v(0) == (1.0 / 3.0).toFloat)
    assert(v(1) == 2.5f)
  }

  test("writeLayer persists the downcast schema") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-precision").toString
    Precision.writeLayer(frame, Precision.SilverLayer, s"$dir/silver")
    val back = spark.read.parquet(s"$dir/silver")
    assert(back.schema("ret_1d").dataType == FloatType)
    assert(back.count() == 2)
  }
}
