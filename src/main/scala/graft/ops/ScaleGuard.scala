package graft.ops

import org.apache.spark.sql.SparkSession

/** Guard rail for the DOCUMENTED-QUADRATIC teaching twins
  * (`sim_cosine_neardup`'s exact-recall sweep, `dedup_simhash`'s
  * all-pairs scan): each is correct by contract but Θ(n²), and its
  * output-identical linear twin (`sim_lsh_topk` / `api.Dedup`
  * LSH pairs, `dedup_simhash_banded`) sits adjacent in the API. A user
  * who picks the quadratic form at corpus scale dies slowly with no
  * signal — this guard is that signal (r11 verdict: "nothing in the
  * engine steers them").
  *
  * Behavior: past `spark.graft.quadraticWarnRows` (default 100 000)
  * the operator logs a loud WARN naming the linear alternative; past
  * `spark.graft.quadraticFailRows` (default unlimited — a deliberate
  * opt-in, so scale checkpoints that MEASURE the quadratic contract
  * still run) it throws. The sizing count is driver metadata — one
  * count() per query build, same bounded-action class as the
  * self-sizing LSH plane derivation.
  */
object ScaleGuard {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val WarnKey = "spark.graft.quadraticWarnRows"
  private val FailKey = "spark.graft.quadraticFailRows"

  /** Check an n-row input against the quadratic guard thresholds.
    * `op` names the operator, `linearAlt` the adjacent linear twin the
    * message steers to. */
  def quadratic(s: SparkSession, op: String, n: Long, linearAlt: String): Unit = {
    val warnAt = s.conf.get(WarnKey, "100000").toLong
    val failAt = s.conf.get(FailKey, Long.MaxValue.toString).toLong
    if (n > failAt) throw new IllegalStateException(
      s"$op is an exact-recall QUADRATIC operator (documented contract) and " +
        s"its input has $n rows > $FailKey=$failAt; use $linearAlt at scale, " +
        s"or raise $FailKey to run the quadratic form anyway")
    if (n > warnAt) log.warn(
      s"$op is QUADRATIC in its $n input rows (~${n * n / 2} pairs); past " +
        s"~10^7 rows this cannot finish — the output-identical linear form " +
        s"is $linearAlt (set $FailKey to hard-fail instead of warning)")
  }
}
