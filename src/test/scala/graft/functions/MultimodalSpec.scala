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

  test("aHash: re-encode noise moves few bits, distinct payloads stay apart") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val payloads = (0L until 40L).map { i =>
      i * 2 -> Array.fill(300)((rnd.nextInt(256) - 128).toByte)
    }
    val rows = payloads.map { case (id, p) => MediaRow(id, "image", p) } ++
      payloads.map { case (id, p) =>
        MediaRow(id + 1, "image", Multimodal.reencodeStub(p, 97)) }
    val sigs = Multimodal.aHash(rows.toDS()).collect()
      .map(r => r.media_id -> r.sig).toMap
    def hd(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // original vs its re-encode: tiny in-place noise → Hamming <= 3
    payloads.foreach { case (id, _) =>
      assert(hd(sigs(id), sigs(id + 1)) <= 3,
        s"re-encode of $id drifted ${hd(sigs(id), sigs(id + 1))} bits")
    }
    // distinct random payloads: far apart (60-bit sigs, expect ~30)
    val cross = for {
      (a, _) <- payloads; (b, _) <- payloads if a < b
    } yield hd(sigs(a), sigs(b))
    assert(cross.min > 3, s"distinct payloads collided at hd=${cross.min}")
  }

  test("aHash edge cases: empty, tiny, and uniform payloads are stable") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(0L, "image", Array.emptyByteArray),
      MediaRow(1L, "image", Array[Byte](42)),
      MediaRow(2L, "image", Array.fill(10)(7.toByte)),     // < 60 bytes
      MediaRow(3L, "image", Array.fill(600)(0.toByte)))    // all-zero
    val sigs = Multimodal.aHash(rows.toDS()).collect()
      .map(r => r.media_id -> r.sig).toMap
    assert(sigs(0L) == 0L)                 // defined: empty → 0
    assert(sigs(2L) == 0L)                 // uniform: no cell beats the mean
    assert(sigs(3L) == 0L)
    // determinism across re-runs
    assert(Multimodal.aHash(rows.toDS()).collect()
      .map(r => r.media_id -> r.sig).toMap == sigs)
  }
}
