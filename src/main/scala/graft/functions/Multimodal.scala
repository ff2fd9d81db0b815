package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder prompt): image/audio/video as
  * opaque `binary` columns with typed metadata. The Spark-side shape —
  * schema, batched per-partition processing, deterministic outputs — is
  * real and tested; the actual codec call is a clearly-marked STUB
  * (no image/audio libraries in this container) that derives
  * deterministic pseudo-metadata from the bytes, so the pipeline is
  * exercised end to end and oracle-checkable.
  *
  * Scale notes: decode/feature-extract runs in `mapPartitions` — the
  * JVM analog of a Pandas-UDF batch: per-partition setup (a real codec
  * would open once per partition, not per row), streaming iterator, no
  * driver involvement. Binary payloads stay columnar in Parquet; pushdown
  * prunes the payload column away for metadata-only queries.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  // Long metadata: byte counts overflow Int at 100 TB payload scale, and
  // BIGINT matches the oracle's octet_length type exactly.
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 width: Long, height: Long, digest: String)
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB decode — stands in for a real image decoder. Deterministic
    * pseudo-dimensions derived from the byte length; a real build swaps
    * ONLY this function for e.g. a javax.imageio call. */
  def decodeStub(payload: Array[Byte]): (Long, Long) = {
    val n = payload.length.toLong
    (n % 640, (n * 7) % 480)
  }

  /** Batched per-partition decode + feature extraction (the Pandas-UDF
    * batch shape in JVM form). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup happens HERE once (codec init in a real build)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h) = decodeStub(r.payload)
        md.reset()
        val digest = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, w, h, digest)
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride` bytes emit a
    * `frameLen`-byte window — one row per sampled frame (flatMap shape,
    * bounded memory per row). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int, frameLen: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val n = r.payload.length
      Iterator.range(0, math.max(n - frameLen + 1, 0), stride).map { off =>
        Frame(r.media_id, off / stride, r.payload.slice(off, off + frameLen))
      }
    }
  }

  final case class ResizedMedia(media_id: Long, new_width: Long, new_height: Long,
                                n_bytes_resized: Long, resized_payload: Array[Byte])

  /** STUB resize — stands in for a real scaler: dimensions divide by
    * `factor`, the payload keeps every factor-th byte (a real build
    * swaps ONLY this arithmetic for a codec resample). Deterministic,
    * so the oracle replays it byte for byte. */
  def resizeStub(payload: Array[Byte], factor: Int): (Long, Long, Array[Byte]) = {
    val (w, h) = decodeStub(payload)
    val out = Array.range(0, payload.length, factor).map(payload(_))
    (w / factor, h / factor, out)
  }

  /** Batched per-partition resize (same mapPartitions batch shape as
    * extractFeatures; a real codec initializes once per partition). */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, p) = resizeStub(r.payload, factor)
        ResizedMedia(r.media_id, w, h, p.length.toLong, p)
      }
    }
  }

  /** STUB re-encode — stands in for a lossy codec round-trip: every
    * `stride`-th byte moves by +1 (mod 256), the in-place micro-noise a
    * real JPEG re-save leaves on the pixel grid. Deterministic, so the
    * oracle replays the perturbation exactly. */
  def reencodeStub(payload: Array[Byte], stride: Int): Array[Byte] = {
    val out = payload.clone()
    var i = 0
    while (i < out.length) {
      if (i % stride == 0) out(i) = ((out(i) + 1) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Batched per-partition re-encode producing id-offset copies (the
    * fixture for perceptual-hash dedup: original and re-encode must
    * collide, distinct media must not). */
  def reencode(media: Dataset[MediaRow], stride: Int,
               idOffset: Long): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaRow(r.media_id + idOffset, r.kind,
                             reencodeStub(r.payload, stride)))
    }
  }

  final case class AHashRow(media_id: Long, sig: Long)

  /** Perceptual average-hash over the decoded payload (STUB decode: the
    * raw bytes stand in for the grayscale plane; a real build swaps ONLY
    * the byte source for a decoded+downscaled pixel grid). The payload
    * splits into `bits` contiguous cells (byte `off` → cell
    * `off·bits div n`); bit c is set iff cell c's mean byte value
    * strictly exceeds the global mean — compared CROSS-MULTIPLIED
    * (cellSum·n > total·cellLen) so the whole hash is exact integer
    * arithmetic the oracle replays (safe while cellSum·n < 2⁶³, i.e.
    * payloads < ~190 MB at byte values ≤ 255). Near-dup pairs then ride
    * d4's pigeonhole machinery: 60-bit sigs, 4 chunks of 15 bits —
    * complete for Hamming ≤ 3. */
  def aHash(media: Dataset[MediaRow], bits: Int = 60): Dataset[AHashRow] = {
    // 1L << c wraps mod 64 past bit 63 (silently folding high cells
    // onto low bits), and the downstream pigeonhole blocking chunks the
    // signature as 4 × 15 bits — so 60 is the hard ceiling
    require(bits > 0 && bits <= 60,
      s"aHash bits must be in 1..60 (4×15-bit chunking downstream; " +
      s"Long shifts wrap at 64): got $bits")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        val n = b.length
        if (n == 0) AHashRow(r.media_id, 0L)
        else {
          var tot = 0L
          var i = 0
          while (i < n) { tot += (b(i) & 0xff); i += 1 }
          val cs = new Array[Long](bits)
          val cl = new Array[Long](bits)
          i = 0
          while (i < n) {
            val c = ((i.toLong * bits) / n).toInt
            cs(c) += (b(i) & 0xff)
            cl(c) += 1
            i += 1
          }
          var sig = 0L
          var c = 0
          while (c < bits) {
            if (cs(c) * n > tot * cl(c)) sig |= (1L << c)
            c += 1
          }
          AHashRow(r.media_id, sig)
        }
      }
    }
  }
}
