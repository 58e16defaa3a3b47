package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload round-trip, partition-wise decode
  * determinism, and the 1-to-n frame-sampling shape. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "abcdef", "s1"), (2L, "z".repeat(700), "s2"), (3L, "m", "s3")
  ).toDF("doc_id", "text", "source")

  test("media table carries the exact payload bytes") {
    val payloads = Multimodal.asMediaTable(docs)
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .collect().toMap
    assert(new String(payloads(1L), "UTF-8") == "abcdef")
    assert(payloads(2L).length == 700)
  }

  test("stub decoder emits deterministic features with the real schema") {
    val f = Multimodal.extractFeatures(Multimodal.asMediaTable(docs))
      .collect().map(x => x.media_id -> x).toMap
    assert(f(1L).n_bytes == 6 && f(1L).width == 7 && f(1L).height == 43)
    assert(f(2L).width == 700 % 640 + 1)
    assert(f(1L).format == "png") // 'a' < 'n'
    assert(f(2L).format == "jpeg") // 'z' >= 'n'
    // partition count must not affect results
    val f2 = Multimodal.extractFeatures(Multimodal.asMediaTable(docs.repartition(5)))
      .collect().map(x => x.media_id -> x).toMap
    assert(f == f2)
  }

  test("frame sampling explodes one row per stride offset") {
    val frames = Multimodal.sampleFrames(Multimodal.asMediaTable(docs), stride = 100)
      .as[(Long, Long)].collect().toSeq
    assert(frames.filter(_._1 == 2L).map(_._2) == Seq(0L, 100L, 200L, 300L, 400L, 500L, 600L))
    assert(frames.filter(_._1 == 3L).map(_._2) == Seq(0L))
  }

  test("payload dedup groups byte-identical assets, keeps min id") {
    val dup = Seq(
      (10L, "same bytes", "s1"), (7L, "same bytes", "s2"), (3L, "other", "s3")
    ).toDF("doc_id", "text", "source")
    val rows = Multimodal.exactPayloadDedup(Multimodal.asMediaTable(dup))
      .select("media_id", "n_copies").as[(Long, Long)].collect().toSeq
    assert(rows == Seq((3L, 1L), (7L, 2L)))
    // digest is over bytes, not metadata: differing sources still collapse
    val sha = Multimodal.exactPayloadDedup(Multimodal.asMediaTable(dup))
      .filter(col("media_id") === 7L).select("payload_sha").as[String].head()
    assert(sha.length == 64 && sha == sha.toLowerCase)
  }
}
