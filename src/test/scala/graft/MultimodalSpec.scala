package graft

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkSpec {

  test("binary pipeline: shape → partition-wise decode → typed features") {
    val docs = Tables.load(spark, sf0001, "documents")
    val media = Multimodal.demoCorpus(spark, docs)
    val feats = Multimodal.extractFeatures(spark, media, partitions = 8)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    // features are real functions of the payload bytes
    rows.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.header_hex.length == 16) // 8 bytes hex'd
      assert(f.mean_byte > 0 && f.mean_byte < 255)
      assert(Set("image", "audio", "video").contains(f.kind))
    }
    // deterministic stub: same input → same features
    val again = Multimodal.extractFeatures(spark, media, partitions = 3).collect()
    assert(rows.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("frame sampling: n evenly-spaced frames per video, offsets ordered") {
    val docs = Tables.load(spark, sf0001, "documents")
    val media = Multimodal.demoCorpus(spark, docs)
    val nVideos = media.filter((m: Multimodal.MediaFile) => m.kind == "video").count()
    val frames = Multimodal.sampleFrames(spark, media, n = 4).collect()
    assert(frames.length == nVideos * 4)
    frames.groupBy(_.media_id).foreach { case (_, fs) =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
      assert(sorted.head.frame_offset == 0)
      assert(sorted.map(_.frame_offset).toSeq == sorted.map(_.frame_offset).sorted.toSeq)
      assert(fs.forall(_.frame_bytes.length <= 32))
    }
  }

  test("resize shrinks payloads deterministically, keeps ids/kinds") {
    val docs = Tables.load(spark, sf0001, "documents")
    val media = Multimodal.demoCorpus(spark, docs)
    val resized = Multimodal.resizeAll(spark, media, factor = 4).collect()
    val orig = media.collect().map(m => m.media_id -> m).toMap
    resized.foreach { r =>
      val o = orig(r.media_id)
      assert(r.kind == o.kind)
      assert(r.content.length == (o.content.length + 3) / 4)
      assert(r.content.headOption == o.content.headOption)
    }
  }
}
