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
  * Offset model: files sorted by (modificationTime, path); offset n = "the
  * first n files have been processed". Assumes an append-only directory
  * (files are not deleted or rewritten), like Spark's built-in file stream
  * source. Each micro-batch plans the newly discovered files with the same
  * byte-range splitting as the batch scan. */
class SeqFileMicroBatchStream(tableSchema: StructType, required: StructType,
                              paths: Seq[String], maxSplitBytes: Long, mode: String)
  extends MicroBatchStream {

  private def discover(): Seq[(String, Long)] = {
    val conf = new Configuration()
    SeqFileDataSource.listFiles(paths, conf)
      .map(st => (st.getPath.toString, st.getLen))
      .sortBy(_._1)
  }

  // Snapshot per planning cycle so latestOffset/planInputPartitions agree.
  @volatile private var snapshot: Seq[(String, Long)] = Nil

  override def initialOffset(): Offset = SeqFileOffset(0)

  override def latestOffset(): Offset = {
    snapshot = discover()
    SeqFileOffset(snapshot.size)
  }

  override def deserializeOffset(json: String): Offset =
    SeqFileOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqFileOffset].n.toInt
    val e = end.asInstanceOf[SeqFileOffset].n.toInt
    val files = if (snapshot.size >= e) snapshot else discover()
    files.slice(s, e).flatMap { case (path, len) =>
      val n = math.max(1L, (len + maxSplitBytes - 1) / maxSplitBytes)
      (0L until n).map { i =>
        SeqFilePartition(path, i * maxSplitBytes, math.min((i + 1) * maxSplitBytes, len))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeqFileReaderFactory(tableSchema, required, mode)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class SeqFileOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}
