package graft.sources.seqfile

/** Bounded-parallelism, order-preserving map for driver-side planning work.
  *
  * Agg and top-N pushdown read one ~100-byte zone-map sidecar (plus the
  * file header) per data file at PLANNING time. Done serially that is
  * O(files) round-trips of driver I/O — fine at thousands of files, minutes
  * at a million-file lake. These reads are independent and I/O-bound, so a
  * fixed thread pool turns planning into O(files / parallelism) wall-clock
  * with no behavior change (results come back in input order; an exception
  * in any task propagates like the serial loop's would).
  */
private[seqfile] object PlanParallel {

  /** Sidecar reads are latency-bound (open + tiny read), not CPU-bound, so
    * oversubscribe cores; capped to keep a million-file lake from spawning
    * an unbounded pool. */
  val Parallelism: Int =
    math.max(4, math.min(64, Runtime.getRuntime.availableProcessors * 2))

  def mapOrdered[A, B](xs: Seq[A])(f: A => B): Seq[B] =
    if (xs.lengthCompare(2) < 0) xs.map(f)
    else {
      import scala.jdk.CollectionConverters._
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(Parallelism, xs.size))
      try {
        val tasks: java.util.List[java.util.concurrent.Callable[B]] =
          xs.map(x => new java.util.concurrent.Callable[B] {
            override def call(): B = f(x)
          }: java.util.concurrent.Callable[B]).asJava
        pool.invokeAll(tasks).asScala.toSeq.map { fut =>
          try fut.get()
          catch {
            case e: java.util.concurrent.ExecutionException =>
              throw Option(e.getCause).getOrElse(e)
          }
        }
      } finally pool.shutdown()
    }
}
