package graft.sources.seqfile

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Micro-batch streaming over a growing directory of sequence files —
  * Structured Streaming's incremental file discovery applied to our format
  * (the streaming story the reference's lazy pull-based `Stream` hints at
  * but never distributes, reference: SequenceFile.hs:63-67).
  *
  * Offset model: a monotonic append-only file log. Offset n = "the first n
  * entries of the log". New files discovered at latestOffset() append to the
  * log in (modificationTime, path) order, so a file whose name sorts before
  * already-processed files never remaps earlier indices (a plain sorted
  * listing would re-read old files and skip the new one). Assumes an
  * append-only directory, like Spark's built-in file stream source. After a
  * restart the log rebuilds from the directory listing in
  * (modificationTime, path) order — correct as long as files were not
  * created with out-of-order timestamps while the query was down. */
class SeqFileMicroBatchStream(tableSchema: StructType, required: StructType,
                              paths: Seq[String], maxSplitBytes: Long, mode: String)
  extends MicroBatchStream {

  private def discover(): Seq[(String, Long, Long)] = {
    val conf = new Configuration()
    SeqFileDataSource.listFiles(paths, conf)
      .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
  }

  // Monotonic log of (path, length); guarded by this.
  private val log = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
  private val seen = scala.collection.mutable.HashSet.empty[String]

  private def appendNew(): Unit = synchronized {
    val fresh = discover().filter(f => !seen.contains(f._1))
      .sortBy(f => (f._3, f._1))
    fresh.foreach { case (p, len, _) =>
      seen += p
      log += ((p, len))
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
      if (log.size < e) appendNew() // restart: rebuild the log before slicing
      log.slice(s, e).flatMap { case (path, len) =>
        val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
        (0L until n).map { i =>
          SeqFilePartition(path, i * maxSplitBytes, math.min((i + 1) * maxSplitBytes, len))
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
