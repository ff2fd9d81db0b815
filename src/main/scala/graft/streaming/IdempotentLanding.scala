package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Exactly-once landing of a DETERMINISTIC micro-batch into a flat
  * parquet sink directory, with per-batch work independent of sink size.
  *
  * The gates' original idempotency story re-read the ENTIRE landed sink
  * and left-anti-joined each micro-batch against it — correct, but
  * O(sink) work per batch, growing without bound over a stream's
  * lifetime. This helper replaces the read-the-world check with the
  * property foreachBatch actually guarantees: a redelivered batch
  * arrives with the SAME batchId over the SAME source offsets, so for a
  * deterministic batch body the output is bit-identical and the landing
  * only has to be idempotent PER BATCH ID. Protocol:
  *
  *  1. `_graft_commits/<batchId>` marker exists → the batch fully
  *     landed before a prior crash: return. O(1).
  *  2. Stage the batch's output under `_graft_staging/<batchId>` with
  *     overwrite — idempotent, a half-written staging dir from a prior
  *     delivery is replaced wholesale.
  *  3. Delete any `graft-b<batchId>-*.parquet` already in the sink (a
  *     prior delivery that crashed mid-publish), then rename the staged
  *     files to those DETERMINISTIC names. Re-running the publish
  *     converges to the same file set even if the task split changed
  *     between deliveries (the delete sweep removes orphans before the
  *     rename). Every rename/delete RESULT is checked: a silent `false`
  *     from the FS must abort the batch, or the marker written in step 4
  *     would certify files that never published and redelivery would
  *     then skip the batch forever.
  *  4. Create the commit marker last: it only becomes visible once the
  *     data it certifies is durable. The marker body is the MANIFEST —
  *     the published file names, one per line — so an auditor, reader,
  *     or compaction job can trust the commit record instead of a
  *     directory listing (the object-store-safe read pattern; see the
  *     filesystem contract below).
  *
  * Both bookkeeping dirs live INSIDE the sink path and start with `_`,
  * which Spark/Hadoop data discovery ignores — `spark.read.parquet(path)`
  * sees exactly the published data files. A crash at ANY point leaves a
  * state the redelivery repairs: before staging (nothing happened),
  * mid-staging (overwritten), mid-publish (swept and re-published),
  * before the marker (re-published to identical content), after the
  * marker (skipped).
  *
  * == Filesystem contract (HDFS semantics assumed) ==
  * Step 3 publishes by `rename`, which this protocol assumes is a cheap
  * ATOMIC METADATA operation — true on HDFS, local filesystems, and
  * rename-capable stores (ABFS, GCS to a point). It is FALSE on
  * S3-style object stores, where "rename" is a copy + delete: non-atomic
  * (a crash mid-rename can leave both or neither name) and O(data), so
  * the staged bytes move twice. On such a store, run this protocol only
  * through an atomic-rename layer (e.g. an HDFS/consistent-metadata
  * tier over the bucket), or switch the READERS to the manifest: every
  * commit marker already lists its published files, so a
  * manifest-trusting reader (union of all markers' file lists) never
  * observes a half-published batch regardless of rename atomicity —
  * that is the standard object-store commit design (Iceberg/Delta's
  * metadata-log pattern), and `manifest()` below exposes the list.
  *
  * == Reader visibility ==
  * Exactly-once here is a CONVERGENCE guarantee for the sink's final
  * content, not snapshot isolation for concurrent readers: a
  * REDELIVERED batch's sweep/rename window (step 3) briefly removes
  * files a prior delivery had already published, so a reader listing
  * the directory mid-repair can see previously-visible rows missing
  * until the re-publish lands. The AvailableNow drain-then-read pattern
  * every gate here uses (single writer, readers start after the stream
  * terminates) is safe; continuous concurrent readers need the manifest
  * read pattern above (markers are never removed, so manifest readers
  * only ever see fully-committed batches).
  *
  * Contract: the caller's batch body must be deterministic given the
  * batch rows (every gate here is — scoring is read-only), and one sink
  * path must be fed by ONE stream with ONE checkpoint lineage (batchId
  * is the key namespace). Pointing a FRESH-checkpoint stream at an old
  * sink restarts batchIds at 0 while old markers persist — the old
  * protocol silently skipped those batches; `land` now fails fast at
  * batch 0 when higher-numbered markers exist (the check runs only at
  * batch 0, so steady-state cost stays O(1) per batch). Residual gap:
  * an old sink whose ONLY marker is batch 0 is indistinguishable from a
  * genuine batch-0 redelivery — use a fresh sink with a fresh
  * checkpoint.
  */
object IdempotentLanding {

  def land(kept: DataFrame, path: String, batchId: Long): Unit = {
    val spark = kept.sparkSession
    val sink = new Path(path)
    val fs = sink.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commitsDir = new Path(path, "_graft_commits")
    val marker = new Path(commitsDir, batchId.toString)
    if (batchId == 0L && fs.exists(commitsDir)) {
      // fresh-checkpoint-on-old-sink detection (see the contract note):
      // batch 0 of a healthy lineage can never follow a committed batch>0
      val stale = fs.listStatus(commitsDir).map(_.getPath.getName)
        .flatMap(n => scala.util.Try(n.toLong).toOption).filter(_ > 0L)
      if (stale.nonEmpty)
        throw new IllegalStateException(
          s"sink $path carries commit markers up to batch ${stale.max} but " +
          "this stream is delivering batch 0 — a fresh-checkpoint stream " +
          "was pointed at an old sink; its batches would silently skip. " +
          "Use a fresh sink directory (or restore the original checkpoint).")
    }
    if (fs.exists(marker)) return // redelivery of a fully-landed batch

    val staging = new Path(path, s"_graft_staging/$batchId")
    kept.write.mode("overwrite").parquet(staging.toString)

    // sweep a prior delivery's partial publish, then publish by rename
    fs.globStatus(new Path(path, s"graft-b$batchId-*.parquet")).foreach { s =>
      if (!fs.delete(s.getPath, false))
        throw new java.io.IOException(
          s"failed to sweep stale published file ${s.getPath} for batch $batchId")
    }
    val parts = fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val published = parts.zipWithIndex.map { case (p, k) =>
      val dest = new Path(path, s"graft-b$batchId-$k.parquet")
      if (!fs.rename(p, dest))
        throw new java.io.IOException(
          s"failed to publish $p -> $dest for batch $batchId — aborting " +
          "before the commit marker so redelivery repairs the batch")
      dest.getName
    }
    fs.delete(staging, true) // best-effort cleanup; an orphan staging dir
                             // is re-overwritten by any future redelivery

    fs.mkdirs(marker.getParent)
    val out = fs.create(marker, true)
    try out.write((published.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    ()
  }

  /** The committed manifest: every published data file certified by a
    * commit marker, in (batchId, file) order. The object-store-safe read
    * set — a manifest-trusting reader (or compaction) takes THIS list as
    * the sink's content instead of a directory listing, so rename
    * non-atomicity and mid-repair sweeps are never observable. */
  def manifest(spark: org.apache.spark.sql.SparkSession,
               path: String): Seq[(Long, String)] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val commitsDir = new Path(path, "_graft_commits")
    if (!fs.exists(commitsDir)) Seq.empty
    else fs.listStatus(commitsDir).toSeq
      .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption
        .map(_ -> s.getPath))
      .sortBy(_._1)
      .flatMap { case (bid, p) =>
        val in = fs.open(p)
        val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                   finally in.close()
        body.split("\n").filter(_.nonEmpty).map(bid -> _)
      }
  }
}
