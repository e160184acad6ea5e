package graft.operators

import org.apache.spark.sql.functions._

/** Small-file compaction for APPEND-ONLY hive-batch-partitioned parquet
  * stores (`root/batch=<id>/...`) whose rows are globally DISTINCT and
  * whose readers are set-semantic — the layout shared by the streaming
  * near-dup index ([[graft.streaming.StreamingNearDedup]], where it
  * originated) and the persisted ANN indexes that grow by incremental
  * ingest ([[LshIndex]]). Collapses every partition with id <= upToBatch
  * into a single `batch=<upToBatch>` partition, bounding both file count
  * and partition-listing cost for a long-lived index.
  *
  * Crash-safe without a transaction log, by DUPLICATE-tolerance rather
  * than atomicity: the caller's reads must be pure SET functions of the
  * store's contents (distinct rows in = same answer out), so a state
  * where a row exists in both an old partition and the merged one changes
  * nothing. The protocol only ever ADDS rows before it removes any:
  *  1. write the merged rows (distinct, so a re-run after a crash
  *     cannot bake duplicates in) to a dot-prefixed staging dir —
  *     invisible to partition discovery;
  *  2. move the staged files INTO `batch=<upToBatch>` one atomic
  *     rename at a time (visible rows now duplicated — harmless);
  *  3. delete the absorbed `batch<upToBatch` partitions, the
  *     pre-existing `batch=<upToBatch>` files, and the staging dir.
  * A crash in 1 leaves invisible garbage; in 2 or 3, duplicates that
  * the next compaction's distinct() absorbs. At no point is a row of
  * the visible store missing. Readers that COUNT raw rows (rather than
  * consume them as a set) must tolerate the transient-duplicate window
  * between an aborted phase-2/3 and the rerun — or read with distinct().
  */
private[graft] object PartitionedCompaction {

  def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
                         root: String, upToBatch: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath)) return
    def batchOf(name: String): Option[Long] =
      if (name.startsWith("batch="))
        scala.util.Try(name.stripPrefix("batch=").toLong).toOption
      else None
    val parts = fs.listStatus(rootPath).toSeq.filter(_.isDirectory)
      .flatMap(st => batchOf(st.getPath.getName).map(b => (b, st.getPath)))
      .filter(_._1 <= upToBatch)
    if (parts.size <= 1) return
    // 1. merged rows aside (dot-dir: invisible to partition discovery)
    val staging = new Path(rootPath, s".compact-staging-$upToBatch")
    spark.read.option("basePath", root).parquet(root)
      .filter(col("batch") <= upToBatch).drop("batch")
      .distinct()
      .write.mode("overwrite").parquet(staging.toString)
    // 2. add staged files to the target partition (atomic per-file renames;
    // duplicate rows during this window are harmless — see scaladoc)
    val target = new Path(rootPath, s"batch=$upToBatch")
    if (!fs.exists(target)) { fs.mkdirs(target): Unit }
    val oldTargetFiles = fs.listStatus(target).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    val tok = java.util.UUID.randomUUID().toString.take(8)
    // Hadoop FileSystem.rename reports most failures by RETURNING FALSE,
    // not throwing. The add-before-remove invariant holds only if every
    // staged file actually became visible — so collect the results and,
    // if any move failed, ABORT before the delete phase: the absorbed
    // source partitions stay, the already-moved files are harmless
    // duplicates the next compaction's distinct() collapses.
    val allMoved = fs.listStatus(staging).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .forall { st =>
        fs.rename(st.getPath,
          new Path(target, s"compact-$tok-${st.getPath.getName}"))
      }
    if (!allMoved) {
      fs.delete(staging, true): Unit // invisible leftovers only
      throw new java.io.IOException(
        s"compaction aborted: rename into $target returned false; " +
          "source partitions left intact (visible rows are duplicated, " +
          "not lost — rerun compaction)")
    }
    // 3. remove absorbed partitions, the superseded target files, staging
    parts.filter(_._1 < upToBatch).foreach { case (_, p) =>
      fs.delete(p, true): Unit
    }
    oldTargetFiles.foreach(p => fs.delete(p, false): Unit)
    fs.delete(staging, true): Unit
  }
}
