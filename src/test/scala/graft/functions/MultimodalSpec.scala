package graft.functions

import graft.SparkSpec
import graft.functions.Multimodal.MediaRow
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      MediaRow(1L, "image", Array.fill[Byte](100)(7)),
      MediaRow(2L, "image", "hello world".getBytes("UTF-8")),
      MediaRow(3L, "video", Array.tabulate[Byte](200)(_.toByte))).toDS()
  }

  test("extractFeatures: stub dims + digest are deterministic and correct") {
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 100)
    assert(feats(1L).width == 100 % 640 && feats(1L).height == (100 * 7) % 480)
    // MD5("hello world")
    assert(feats(2L).digest == "5eb63bbbe01eeed093cb22bb8f5acdc3")
    val again = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.digest).toMap
    assert(again == feats.view.mapValues(_.digest).toMap)
  }

  test("sampleFrames emits bounded windows at the stride") {
    val frames = Multimodal.sampleFrames(media.filter(_.media_id == 3L), 64, 32)
      .collect().sortBy(_.frame_idx)
    // 200 bytes, stride 64, frame 32 → offsets 0, 64, 128 (192+32 > 200)
    assert(frames.length == 3)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(frames.forall(_.frame_bytes.length == 32))
    assert(frames(1).frame_bytes.head == 64.toByte)
  }

  test("metadata query prunes the payload column at the scan") {
    val plan = graft.SparkEntry.queries("mm3_metadata_prune")(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the parquet ReadSchema must not include the fat `text` column
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty)
    assert(!readSchema.contains("text"), s"payload not pruned: $readSchema")
  }
}
