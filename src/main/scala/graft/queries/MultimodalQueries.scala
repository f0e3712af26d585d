package graft.queries

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Multimodal-column queries: binary payload + typed metadata, stubbed
  * decode (see Multimodal scaladoc), frame-index sampling, and the batched
  * mapPartitions feature-extraction path (rows-only check — its checksum
  * kernel is JVM-side by design).
  */
object MultimodalQueries extends QueryModule {

  private def hsql(e: String) =
    s"('0x' || substring(md5($e), 1, 15))::BIGINT"

  def all: Seq[Q] = Seq(

    Q("q_m_media_meta", Some(s"""
      SELECT doc_id,
             octet_length(encode(text)) AS byte_len,
             CAST(${hsql("text")} % 576 + 64 AS INT) AS width,
             CAST(${hsql("reverse(text)")} % 416 + 64 AS INT) AS height,
             CAST(floor(octet_length(encode(text)) / 256.0) AS INT) + 1
               AS n_frames,
             doc_id % 32 AS batch_id
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Multimodal.decodeMeta(Multimodal.withPayload(t(s, dir, "documents")))
        .orderBy("doc_id")
    },

    Q("q_m_frame_sample", Some(s"""
      WITH meta AS (
        SELECT doc_id,
               CAST(floor(octet_length(encode(text)) / 256.0) AS INT) + 1
                 AS n_frames
        FROM documents)
      SELECT doc_id, n_frames,
             CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
      FROM meta
      ORDER BY doc_id, frame_idx""")) { (s, dir) =>
      val meta = Multimodal.decodeMeta(
        Multimodal.withPayload(t(s, dir, "documents")))
      Multimodal.frameSample(meta, step = 2)
        .select(col("doc_id"), col("n_frames"),
          col("frame_idx").cast("int").as("frame_idx"))
        .orderBy("doc_id", "frame_idx")
    },

    // Batched partition-wise extraction (mapInPandas-shaped). The stub
    // checksum is a deterministic byte fold, so it oracles as a character
    // code-point fold (documents are ASCII → bytes ≡ code points).
    Q("q_m_batch_features", Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS byte_len,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''),
                 c -> CAST(unicode(c) AS BIGINT))),
               (a, b) -> (a * 31 + b) % 1000000007) AS checksum
      FROM documents ORDER BY doc_id""")) { (s, dir) =>
      Multimodal.extractFeaturesBatched(
          Multimodal.withPayload(t(s, dir, "documents")), batchSize = 64)
        .orderBy("doc_id")
    }
  )
}
