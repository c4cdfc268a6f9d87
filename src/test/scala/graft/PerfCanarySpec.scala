package graft

/** Weak-set regression canary (VERDICT r14 #5): the four floor
  * decisions (q82/q119/q171/q188) and q52's tier-skip "free at small
  * SF" property are one build change away from silently regressing.
  * Wall-clock asserts are flaky on a shared box, but every one of
  * these queries is JOB-FLOOR-BOUND — their recorded times are
  * (job count) × (~0.2-0.4 s scheduling floor) — so the DETERMINISTIC
  * pin is the Spark job count: a change that re-adds a deleted pass,
  * un-fuses an aggregate, or re-enables q52's LSH tier where the df
  * budget never binds shows up as extra jobs long before it shows up
  * as seconds. Counted via the public statusTracker job-group API at
  * sf0.01 (job counts are plan-structural, not load-dependent; AQE
  * materializes one job per exchange stage, which is exactly the
  * currency these floors are priced in).
  *
  * Ceilings are the observed shipped-build counts — NOT observed+slack:
  * a single extra job is a real floor regression on queries this
  * shape. If a deliberate plan change moves a count, re-pin it here
  * WITH the bench number that justifies it.
  *
  * The complementary wall-clock canary lives in Bench.scala: driver
  * sf0.1 runs emit a `canary` field comparing the five against their
  * recorded ceilings × 1.5, loud in the committed artifact.
  */
class PerfCanarySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private def jobCount(name: String): Int = {
    val sc = spark.sparkContext
    val group = s"perf-canary-$name"
    sc.setJobGroup(group, name, interruptOnCancel = false)
    try SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    finally sc.clearJobGroup()
    // statusTracker is synchronous enough for completed jobs, but the
    // listener bus is async — settle briefly before reading
    Thread.sleep(300)
    sc.statusTracker.getJobIdsForGroup(group).length
  }

  describe("weak-set job-count canary") {
    // ceilings = the exact counts measured on the round-15 shipped
    // build (sf0.01, AQE on, local[4]; three consecutive runs agreed
    // to the job). These are SCHEDULER jobs — AQE materializes each
    // exchange stage and broadcast build as its own job — so they sit
    // above the QueryDef docs' corpus-pass ledgers, but they move in
    // the same direction and by at least one whenever a pass is
    // re-added, which is the regression being guarded.
    val ceilings = Map(
      "q82_column_profile"      -> 14, // 6 union branches × 2-level distinct
      "q119_robust_scaling"     -> 11, // melt groupBy + bit-bucket counts quantiles
                                       // (was 16 before nonNegQuantilesFromCounts)
      "q171_warehouse_pipeline" -> 23, // composition: audit futures + RFM chain
      "q188_conformal_interval" -> 12, // model+ckpt, bit-histogram, fetch, test
      "q52_dedup_apply"         -> 17, // guarded exact tier only: the LSH tier's
                                       // jobs must NOT appear while df ≤ budget
      // the round-15 bit-bucket fusions (not weak-set members, but one
      // build change from silently re-growing their deleted passes)
      "q157_woe_iv"             -> 8,  // bit-bucket hist + fetch (2 corpus jobs)
      "q175_gains_deciles"      -> 6   // same fusion, driver-finished tail
    )
    ceilings.foreach { case (name, ceiling) =>
      it(s"$name schedules at most $ceiling jobs") {
        val n = jobCount(name)
        info(s"$name: $n jobs")
        assert(n <= ceiling,
          s"$name scheduled $n jobs (ceiling $ceiling) — a floor pass was re-added; " +
            "see PerfCanarySpec's scaladoc before re-pinning")
      }
    }
  }
}
