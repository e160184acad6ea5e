package graft.sources.seqfile

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over a growing directory of sequence files —
  * Structured Streaming's incremental file discovery applied to our format
  * (the streaming story the reference's lazy pull-based `Stream` hints at
  * but never distributes, reference: SequenceFile.hs:63-67).
  *
  * Offset model: a monotonic append-only file log. Offset n = "the first n
  * entries of the log". New files discovered at latestOffset() append in
  * (modificationTime, path) order. The log is PERSISTED under the query's
  * checkpoint (like Spark's built-in file stream source), so a restart
  * replays offsets against the exact same file ordering even when the live
  * discovery order diverged from timestamp order (slow writers, listing
  * lag). Assumes an append-only directory. */
class SeqFileMicroBatchStream(tableSchema: StructType, required: StructType,
                              paths: Seq[String], maxSplitBytes: Long, mode: String,
                              checkpointLocation: String)
  extends MicroBatchStream {

  private def discover(): Seq[(String, Long, Long)] = {
    val conf = new Configuration()
    SeqFileDataSource.listFiles(paths, conf)
      .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
  }

  // Monotonic log of (path, length); guarded by this. Mirrored to the
  // checkpoint after every append.
  private val log = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
  private val seen = scala.collection.mutable.HashSet.empty[String]

  private val logPath = new Path(checkpointLocation, "graft-seqfile-log")

  locally { // restore the persisted log on (re)start
    try {
      val fs = logPath.getFileSystem(new Configuration())
      if (fs.exists(logPath)) {
        val in = fs.open(logPath)
        val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        content.split("\n").filter(_.nonEmpty).foreach { line =>
          val sep = line.lastIndexOf('\t')
          val (p, len) = (line.substring(0, sep), line.substring(sep + 1).toLong)
          if (!seen.contains(p)) { seen += p; log += ((p, len)) }
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        SeqFileScan.log.warn(s"seqfile stream: could not restore file log from $logPath: $e")
    }
  }

  // Persistence failure FAILS the batch (like Spark's HDFSMetadataLog): a
  // swallowed write would let the query commit offsets whose file binding
  // exists only in this JVM — a restart would rebuild ordering from
  // (modTime, path) and could silently duplicate or drop data.
  private def persistLog(): Unit = {
    val conf = new Configuration()
    val fs = logPath.getFileSystem(conf)
    fs.mkdirs(logPath.getParent)
    val tmp = new Path(logPath.getParent, logPath.getName + ".tmp")
    val out = fs.create(tmp, true)
    try log.foreach { case (p, len) => out.write(s"$p\t$len\n".getBytes("UTF-8")) }
    finally out.close()
    // Atomic replace: a delete-then-rename pair would lose the log entirely
    // if the process died between the two calls.
    org.apache.hadoop.fs.FileContext.getFileContext(logPath.toUri, conf)
      .rename(tmp, logPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def appendNew(): Unit = synchronized {
    val fresh = discover().filter(f => !seen.contains(f._1))
      .sortBy(f => (f._3, f._1))
    if (fresh.nonEmpty) {
      fresh.foreach { case (p, len, _) =>
        seen += p
        log += ((p, len))
      }
      persistLog()
    }
  }

  override def initialOffset(): Offset = SeqFileOffset(0)

  override def latestOffset(): Offset = {
    appendNew()
    synchronized(SeqFileOffset(log.size))
  }

  override def deserializeOffset(json: String): Offset =
    SeqFileOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqFileOffset].n.toInt
    val e = end.asInstanceOf[SeqFileOffset].n.toInt
    synchronized {
      // Every offset Spark can pass here was returned by a latestOffset()
      // call that persisted >= e log entries BEFORE returning — so a shorter
      // log after restore always means the checkpoint log was lost or
      // truncated. Re-running discovery to fill the gap would silently
      // rebind committed offsets to whatever (modTime, path) order the
      // directory lists TODAY — the exact duplicate/drop hazard this log
      // exists to prevent. Fail instead; never rediscover into a gap.
      if (log.size < e)
        throw new IllegalStateException(
          s"seqfile stream: committed offset $e exceeds the restored file log " +
          s"(${log.size} entries) at $logPath — checkpoint log lost or " +
          "directory not append-only; refusing to rebind offsets to " +
          "different files")
      log.slice(s, e).flatMap { case (path, len) =>
        // partition values re-derive from the stored path's k=v segments,
        // so hive-partitioned directories stream like flat ones
        val pvals = SeqFileDataSource.partitionValuesFromPath(path)
        val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
        (0L until n).map { i =>
          SeqFilePartition(path, i * maxSplitBytes,
            math.min((i + 1) * maxSplitBytes, len), pvals)
        }
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqFileReaderFactory(tableSchema, required, mode)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class SeqFileOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}
