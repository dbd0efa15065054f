package graft.core

import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.{JsonMethods, Serialization}

/** Collection configuration, JSON round-trippable.
  *
  * Mirrors the reference's `CollectionConfig`
  * (src/collection/collection_utils.rs:13-57): every field has a default so
  * partial/unknown JSON loads cleanly. The reference *reads* `config.json`
  * but never writes it (a gap — collection_utils.rs:72-78 has the only
  * access); we persist it at create time, which is the obviously intended
  * behavior.
  *
  * `model_variant` (`f32`/`f16`/`i8`) is storage metadata only: Spark has no
  * f16 column type, so computation is always f32/f64 and the variant is kept
  * for config parity.
  */
case class CollectionConfig(
    name: String = "default",
    index_columns: Seq[String] = Seq("text"),
    model_name: String = "hf://mys/minilm",
    model_variant: String = "f32",
    db_path: String = "data",
    index_dir: String = "index",
    serialization_version: Int = 1
)

object CollectionConfig {
  implicit private val formats: Formats = DefaultFormats

  def fromJson(json: String): CollectionConfig =
    JsonMethods.parse(json).extract[CollectionConfig]

  def toJson(c: CollectionConfig): String = Serialization.writePretty(c)
}
