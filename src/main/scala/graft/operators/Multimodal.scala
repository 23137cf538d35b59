package graft.operators

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata.
  *
  * The fixture corpus has no real image/audio bytes (and the container has
  * no codec libraries — builder prompt), so the payload here is the UTF-8
  * encoding of `documents.text` and the "decode" is a deterministic fake.
  * What is real and verified: the BinaryType column flow, byte-length
  * metadata extraction, and stable derived features — the exact schema and
  * partitioning shape a real decoder would slot into. The executor-side
  * batch decode path (mapPartitions with a per-partition codec singleton)
  * lives in graft.kernel and is spec-tested.
  */
object Multimodal {

  val specs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "m1_binary_metadata",
      (s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .withColumn("payload", encode($"text", "UTF-8"))
          .select(
            $"doc_id",
            octet_length($"payload").cast("long").as("n_bytes"),
            ascii(substring($"text", 1, 1)).cast("long").as("magic_byte"),
            // deterministic fake "decode": pretend dimensions from size
            (octet_length($"payload") % 640).cast("long").as("fake_width"),
            (octet_length($"payload") % 480).cast("long").as("fake_height"),
            (octet_length($"payload") / 100 + 1).cast("long").as("fake_frames"))
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS magic_byte,
               CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
               CAST(octet_length(encode(text)) % 480 AS BIGINT) AS fake_height,
               CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS fake_frames
        FROM documents ORDER BY doc_id"""))
  )
}
