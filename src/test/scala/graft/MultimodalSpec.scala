package graft

import graft.mm.Multimodal
import graft.mm.Multimodal._
import org.apache.spark.sql.functions._

/** Multimodal plumbing tests: binary columns, batched partition-local
  * decode, feature shape, resize, frame sampling, byte-budget
  * partitioning. The codec is the documented deterministic stub; the
  * plumbing around it is what's under test.
  */
class MultimodalSpec extends SparkFunSuite {

  lazy val media = Multimodal.synthesizeMedia(spark, sf0001).cache()

  test("synthesized media: binary column with parseable header, 500 rows") {
    assert(media.count() == 500)
    val first = media.filter(col("media_id") === 0).head()
    val (w, h, fr) = StubCodec.decodeHeader(first.content)
    assert(w == 64 && h == 64 && fr == 1)
    assert(media.select("mime").distinct().count() == 3)
  }

  test("decodeMeta extracts typed metadata for every record") {
    val meta = decodeMeta(media, batchSize = 7).cache()
    assert(meta.count() == 500)
    val m = meta.filter(col("media_id") === 5).head()
    assert(m.width == 64 + 5 % 192 && m.n_frames == 6)
    assert(meta.filter(col("content_len") <= 16).count() == 0)
    // schema contract: no binary column survives into the metadata table
    assert(!meta.schema.fields.exists(_.dataType ==
      org.apache.spark.sql.types.BinaryType))
  }

  test("extractFeatures yields fixed-width float vectors, deterministic") {
    val f1 = extractFeatures(media).filter(col("media_id") === 3).head()
    val f2 = extractFeatures(media).filter(col("media_id") === 3).head()
    assert(f1.feature.length == 16)
    assert(f1.feature.toSeq == f2.feature.toSeq)
    assert(math.abs(f1.feature.sum - 1.0f) < 1e-3)
  }

  test("resize rewrites header dims and shrinks payload") {
    val resized = resizeAll(media, 32, 32)
    val r = resized.filter(col("media_id") === 10).head()
    val (w, h, _) = StubCodec.decodeHeader(r.content)
    assert(w == 32 && h == 32)
    val orig = media.filter(col("media_id") === 10).head()
    assert(r.content.length <= orig.content.length)
  }

  test("frame sampling explodes videos into per-frame records") {
    val frames = sampleFrames(media, everyNth = 5).cache()
    assert(frames.count() > 0)
    assert(frames.select("mime").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("image/png"))
    // every source video contributes ceil(frames/5) samples
    val vids = media.filter(col("mime") === "video/mp4")
    val expected = vids.collect().map { r =>
      val (_, _, fr) = StubCodec.decodeHeader(r.content)
      (fr + 4) / 5
    }.sum
    assert(frames.count() == expected)
  }

  test("repartitionByBytes produces byte-budgeted partitions") {
    val rp = repartitionByBytes(media, targetBytesPerPartition = 16L << 10)
    assert(rp.rdd.getNumPartitions >= 2)
    assert(rp.count() == 500)
  }
}
