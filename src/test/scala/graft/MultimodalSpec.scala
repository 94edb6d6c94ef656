package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("synthetic corpus is deterministic and feature extraction round-trips the header") {
    val feats = Multimodal.extractFeatures(
      Multimodal.synthesizeCorpus(spark, 30)).collect().sortBy(_.media_id)
    assert(feats.length == 30)
    // header dims survive the decode path
    val again = Multimodal.extractFeatures(
      Multimodal.synthesizeCorpus(spark, 30)).collect().sortBy(_.media_id)
    assert(feats.map(f => (f.media_id, f.width, f.height, f.brightness)).toSeq ==
      again.map(f => (f.media_id, f.width, f.height, f.brightness)).toSeq)
    // histogram is a distribution
    feats.foreach { f =>
      assert(math.abs(f.histogram.sum - 1.0) < 1e-9, s"hist not normalized: ${f.histogram.sum}")
      assert(f.width >= 8 && f.height >= 8)
    }
  }

  test("media stats stay relational over the binary column") {
    val stats = Multimodal.mediaStats(Multimodal.synthesizeCorpus(spark, 30))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.values.sum == 30)
    assert(stats.keySet == Set("image", "audio", "video"))
  }
}
