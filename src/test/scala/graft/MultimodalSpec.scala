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
}
