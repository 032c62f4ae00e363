package graft

/** Bounded-pool driver-side parallelism with cancel-on-failure — the
  * shared core of lake.Procedures.parGroups (partition-group rewrites)
  * and queries.TextOps.parSteps (disjoint-table commit overlap).
  * Tasks are independent Spark job chains; jobs submitted from
  * different threads interleave in Spark's scheduler, so a sequential
  * loop would make wall-clock the SUM of per-task latencies. On any
  * task failure the siblings are cancelled and the pool drained
  * before the cause rethrows, so no task outlives the call. Results
  * return in input order (deterministic downstream commits). */
object Par {
  def all[T](maxThreads: Int, tasks: Seq[() => T]): Seq[T] = {
    if (tasks.lengthCompare(1) <= 0) return tasks.map(_.apply())
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(maxThreads, tasks.size))
    var futures: Seq[java.util.concurrent.Future[T]] = Nil
    try {
      futures = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[T] {
          override def call(): T = t()
        }))
      futures.map { fu =>
        try fu.get()
        catch { case e: java.util.concurrent.ExecutionException =>
          throw e.getCause }
      }
    } catch {
      case t: Throwable =>
        futures.foreach(_.cancel(true))
        pool.shutdownNow()
        pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
        throw t
    } finally pool.shutdown()
  }
}
