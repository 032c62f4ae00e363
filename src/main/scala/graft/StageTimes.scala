package graft

/** Per-query sub-stage wall times, recorded by operators that build a
  * persistent structure inside their timed gate (the stored dedup
  * index, the stored IVF file). The gate's headline number is
  * build + probe in one figure — fine for correctness, useless for
  * grading the SERVING path, whose whole point is that the build is
  * amortized across many probes. Operators record `build`/`probe`
  * (and repeat-probe samples) here; the bench harness drains the map
  * after each timed query and publishes them as `stages` in
  * bench.json, keyed `<query>.<stage>`.
  */
object StageTimes {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  def timed[T](stage: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    record(stage, (System.nanoTime() - t0) / 1e9)
    r
  }

  def record(stage: String, sec: Double): Unit = m.put(stage, sec)

  /** Snapshot and clear — one bench query's worth of stages. */
  def drain(): Map[String, Double] = {
    val it = m.entrySet().iterator()
    val b = Map.newBuilder[String, Double]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    m.clear()
    b.result()
  }
}
