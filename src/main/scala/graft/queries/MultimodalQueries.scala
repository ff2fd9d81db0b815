package graft.queries

import graft.{QueryDef, Tables}
import graft.QueryDef.q
import graft.functions.Multimodal
import graft.functions.Multimodal.MediaRow
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payloads are fabricated from the
  * documents table (utf-8 bytes) so the decode/feature/frame-sample
  * plumbing runs on real distributed binary columns, and — because the
  * stub decode is deterministic arithmetic over byte lengths and MD5 —
  * DuckDB can replay every step as the oracle.
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // Decode + feature-extract over a binary column via batched
    // mapPartitions (the Pandas-UDF shape; Multimodal.extractFeatures)
    q("mm1_decode_features",
      """SELECT doc_id AS media_id,
        |       octet_length(CAST(text AS BLOB)) AS n_bytes,
        |       octet_length(CAST(text AS BLOB)) % 640 AS width,
        |       (octet_length(CAST(text AS BLOB)) * 7) % 480 AS height,
        |       md5(text) AS digest
        |FROM documents ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("image").as("kind"),
                col("text").cast("binary").as("payload"))
        .as[MediaRow]
      Multimodal.extractFeatures(media).toDF()
        .select("media_id", "n_bytes", "width", "height", "digest")
        .orderBy("media_id")
    },

    // Frame sampling of "video" payloads: every 64 bytes, a 32-byte
    // frame; one output row per frame (Multimodal.sampleFrames)
    q("mm2_frame_sample",
      """WITH f AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, greatest(octet_length(CAST(text AS BLOB)) - 31, 0), 64)) AS off
        |  FROM documents)
        |SELECT doc_id AS media_id, CAST(off / 64 AS INTEGER) AS frame_idx,
        |       md5(substring(text, CAST(off AS INTEGER) + 1, 32)) AS frame_digest
        |FROM f ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("video").as("kind"),
                col("text").cast("binary").as("payload"))
        .as[MediaRow]
      Multimodal.sampleFrames(media, stride = 64, frameLen = 32).toDF()
        .select(col("media_id"), col("frame_idx"),
                md5(col("frame_bytes")).as("frame_digest"))
        .orderBy("media_id", "frame_idx")
    },

    // Metadata-only projection over a media table: the payload column
    // must be PRUNED at the scan (asserted via .explain in the spec) —
    // the property that makes 100 TB of media queryable for metadata
    q("mm3_metadata_prune",
      """SELECT doc_id AS media_id, source, n_chars FROM documents
        |WHERE n_chars > 300 ORDER BY media_id""".stripMargin) { (s, dir) =>
      // model: documents stands in for a media table whose `text` is the
      // fat payload column; this query must never read it
      Tables.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"), col("source"), col("n_chars"))
        .filter(col("n_chars") > 300)
        .orderBy("media_id")
    },

    // Resize (stub codec, real plumbing): dims halve, payload keeps
    // every 2nd byte — DuckDB replays the byte subsample as the oracle
    // (VARCHAR ops: testdata text is single-byte; BLOB slicing is not
    // available there)
    q("mm4_resize",
      """WITH o AS (
        |  SELECT doc_id, text, octet_length(CAST(text AS BLOB)) AS n,
        |         unnest(range(0, octet_length(CAST(text AS BLOB)), 2)) AS off
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |       CAST((n % 640) // 2 AS BIGINT) AS new_width,
        |       CAST(((n * 7) % 480) // 2 AS BIGINT) AS new_height,
        |       count(*) AS n_bytes_resized,
        |       md5(string_agg(substring(text, CAST(off AS INT) + 1, 1), ''
        |           ORDER BY off)) AS resized_digest
        |FROM o GROUP BY doc_id, n ORDER BY media_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id").as("media_id"), lit("image").as("kind"),
                col("text").cast("binary").as("payload"))
        .as[MediaRow]
      Multimodal.resize(media, factor = 2).toDF()
        .select(col("media_id"), col("new_width"), col("new_height"),
                col("n_bytes_resized"), md5(col("resized_payload")).as("resized_digest"))
        .orderBy("media_id")
    },

    // Training-pair assembly: text ⋈ embedding by id with a minimum-
    // length quality gate — the join that builds (text, embedding, label)
    // training samples. Scale shape: both sides shuffle once on the id
    // (or zero times if bucketed on it at write, per s10); the quality
    // predicate is pushed to the documents scan.
    q("mm5_pair_assembly",
      """SELECT d.doc_id AS doc_id, d.source AS source, d.lang AS lang,
        |       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
        |       e.label AS label, CAST(len(e.embedding) AS BIGINT) AS dim
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |WHERE d.n_chars >= 50
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents").filter(col("n_chars") >= 50)
      val e = Tables.load(s, dir, "embeddings")
      d.join(e, d("doc_id") === e("vec_id"))
        .select(d("doc_id"), d("source"), d("lang"),
          size(split(d("text"), " ")).cast("long").as("n_tokens"),
          e("label"), size(e("embedding")).cast("long").as("dim"))
        .orderBy("doc_id")
    },

    // Perceptual-hash near-dup over media payloads (round 7): the image
    // twin of d4's text simhash. The media table holds each payload AND
    // its lossy "re-encode" (Multimodal.reencodeStub: every 97th byte
    // +1 mod 256 — the in-place micro-noise a JPEG re-save leaves;
    // media_id = 2·doc_id, re-encode = 2·doc_id + 1 — a PARITY flag, so
    // the encoding survives any doc_id range, incl. sf1's 1e8-offset
    // copies). aHash (Multimodal.aHash, stub decode:
    // raw bytes as the grayscale plane) gives each payload a 60-bit
    // signature from exact-integer cell-vs-global mean comparisons;
    // candidate pairs ride d4's pigeonhole blocking (4 chunks × 15 bits,
    // complete for Hamming ≤ 3) and verify by bit_count(xor). The
    // operator must flag original↔re-encode pairs while DISTINCT docs
    // stay out (their measured pairwise hd floor on this corpus is 8).
    // Scale shape identical to d4: signature is one mapPartitions pass
    // over the payload scan, the only shuffle is the (chunk_idx,
    // chunk_val) equi-join. DuckDB replays the byte sums, the
    // perturbation, the cross-multiplied bit test, chunking, and the
    // Hamming verify bit-for-bit.
    q("mm6_phash_neardup",
      """WITH raw AS (
        |  SELECT doc_id * 2 AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id * 2 + 1 AS media_id, text FROM documents),
        |byts AS (
        |  SELECT media_id, hex(encode(text)) AS h,
        |         octet_length(encode(text)) AS n,
        |         unnest(range(0, octet_length(encode(text)))) AS off
        |  FROM raw),
        |-- bytes indexed AS BYTES via the hex dump (not by CHARACTER:
        |-- ascii(substr(text,...)) reads code points, which diverges
        |-- from Spark's cast(text AS binary) UTF-8 bytes on any
        |-- non-ASCII document), so the oracle stays valid if the corpus
        |-- gains non-ASCII text
        |vals AS (
        |  SELECT media_id, n, (off * 60) // n AS c,
        |         CASE WHEN media_id % 2 = 1 AND off % 97 = 0
        |              THEN (bv + 1) % 256 ELSE bv END AS v
        |  FROM (
        |    SELECT media_id, n, off,
        |           (strpos('0123456789ABCDEF', substr(h, CAST(off * 2 + 1 AS INTEGER), 1)) - 1) * 16
        |           + (strpos('0123456789ABCDEF', substr(h, CAST(off * 2 + 2 AS INTEGER), 1)) - 1) AS bv
        |    FROM byts)),
        |tot AS (SELECT media_id, any_value(n) AS n, sum(v) AS tv
        |        FROM vals GROUP BY media_id),
        |cells AS (SELECT media_id, c, sum(v) AS cs, count(*) AS cl
        |          FROM vals GROUP BY media_id, c),
        |sig AS (
        |  SELECT cells.media_id,
        |         CAST(sum(CASE WHEN cs * t.n > t.tv * cl
        |                       THEN (1::BIGINT << CAST(c AS INTEGER))
        |                       ELSE 0 END) AS BIGINT) AS sig
        |  FROM cells JOIN tot t ON cells.media_id = t.media_id
        |  GROUP BY cells.media_id),
        |ch AS (
        |  SELECT media_id, sig, c2, (sig >> CAST(c2 * 15 AS INTEGER)) & 32767 AS cv
        |  FROM sig CROSS JOIN (SELECT unnest(range(4)) AS c2))
        |SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
        |       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hd
        |FROM ch a JOIN ch b ON a.c2 = b.c2 AND a.cv = b.cv AND a.media_id < b.media_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY media_a, media_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.functions.Dedup.{simhashChunks, hamming}
      val originals = Tables.load(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select((col("doc_id") * 2).as("media_id"), lit("image").as("kind"),
                col("text").cast("binary").as("payload"))
        .as[MediaRow]
      val media = originals.union(
        Multimodal.reencode(originals, stride = 97, idOffset = 1L))
      val sig = Multimodal.aHash(media).toDF()
      val chunks = sig.select(col("media_id"), col("sig"),
          explode(simhashChunks(col("sig"), 4, sigBits = 60)).as("c"))
        .select(col("media_id"), col("sig"), col("c.chunk_idx"), col("c.chunk_val"))
      chunks.as("a")
        .join(chunks.as("b"),
          col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_val") === col("b.chunk_val") &&
          col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
                hamming(col("a.sig"), col("b.sig")).cast("long").as("hd"))
        .distinct()
        .filter(col("hd") <= 3)
        .orderBy("media_a", "media_b")
    },
  )
}
