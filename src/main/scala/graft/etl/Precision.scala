package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Layer float-precision policy (SURVEY §1.2; ref
  * src/mf_etl/transform/dtypes.py:11-45, configs/settings.yaml:14-17):
  * Bronze stores Float64, Silver and Gold store Float32. The reference
  * computes every feature in Float64 and downcasts as the LAST
  * projection before write (silver/features_base.py:213-218;
  * gold/features_v1.py `float_dtype=pl.Float32`) — cast order matters
  * for parity, so the engine does the same: all query/oracle math stays
  * DoubleType, `withPrecision` is applied only at the storage boundary.
  *
  * At 100 TB the policy is also a scan-cost lever: Float32 halves the
  * silver/gold column bytes (and the downstream shuffle width) for
  * features that are consumed by ML readers tolerant of single
  * precision.
  */
object Precision {

  private def parseFloat(s: String): DataType = s.trim.toLowerCase match {
    case "float32" => FloatType
    case "float64" => DoubleType
    case other => throw new IllegalArgumentException(
      s"precision.*_float must be float32|float64, got '$other'")
  }

  sealed trait Layer { def floatType: DataType; def name: String }
  case object BronzeLayer extends Layer {
    def floatType: DataType = parseFloat(graft.Settings.precision.bronzeFloat)
    val name = "bronze"
  }
  case object SilverLayer extends Layer {
    def floatType: DataType = parseFloat(graft.Settings.precision.silverFloat)
    val name = "silver"
  }
  case object GoldLayer extends Layer {
    def floatType: DataType = parseFloat(graft.Settings.precision.goldFloat)
    val name = "gold"
  }

  /** Final-projection downcast: every DoubleType column → the layer's
    * float dtype; keys, ints, bools, dates, strings untouched. Bronze is
    * the identity (Float64 in, Float64 out). */
  def withPrecision(df: DataFrame, layer: Layer): DataFrame =
    if (layer.floatType == DoubleType) df
    else df.select(df.schema.fields.map { f =>
      if (f.dataType == DoubleType)
        col(f.name).cast(layer.floatType).as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)

  /** Storage-boundary writer: precision cast, then atomic zstd parquet —
    * the shape every layer write goes through in the reference
    * (write_parquet_atomic with the layer dtype map applied). */
  def writeLayer(df: DataFrame, layer: Layer, path: String): Unit =
    withPrecision(df, layer)
      .write.mode("overwrite")
      .option("compression", graft.Settings.parquet.compression)
      .parquet(path)
}
