package graft

import org.apache.spark.sql.DataFrame

/** Materialization barrier for intermediates that feed multiple
  * consumers or iterative rounds (shingle tables, label-propagation
  * frontiers, packing spines): compute once, truncate lineage, reuse.
  *
  * Which barrier depends on the deployment:
  *
  *  - With a RELIABLE checkpoint dir configured
  *    (`sparkContext.setCheckpointDir` — HDFS/S3 on a real cluster),
  *    use `checkpoint`: blocks live in the shared filesystem and
  *    survive executor loss, the property that matters on a
  *    1000-executor run where preemption/decommission is routine. A
  *    `localCheckpoint` there is a correctness-of-availability bug:
  *    its blocks die with their executor AND the lineage needed to
  *    recompute them was severed — the job fails instead of recovering.
  *  - Without one (zero-config local/dev, single-JVM `local[n]` where
  *    executor loss means the whole JVM died anyway), use
  *    `localCheckpoint`: same lineage truncation, no filesystem
  *    round-trip.
  *
  * Both are eager, so the common pattern — materialize once, feed the
  * df count AND the score join — pays the upstream computation exactly
  * once either way.
  */
object Stage {
  /** Plan-audit hook (PlanSpec's suite-wide window gate). A barrier
    * truncates lineage, which HIDES every upstream operator from a
    * whole-plan audit of the final DataFrame — round 10's stale-
    * allowlist trap: four allowlisted unpartitioned windows had slid
    * inside mat'd stages and their bounds were silently unexercised.
    * When set, every mat barrier first hands the recorder its input's
    * optimized plan, so the gate audits staged subtrees too. Test-only;
    * never set in production paths.
    */
  @volatile private[graft] var recorder:
    Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan => Unit] = None

  def mat(df: DataFrame): DataFrame = {
    recorder.foreach(_(df.queryExecution.optimizedPlan))
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }

  /** Scan-parallelism guard (guide §2.5: "input skew — one huge
    * unsplittable file … repartition immediately after the read"): when
    * a scan arrives in fewer partitions than the session's parallelism
    * AND the per-row work downstream is the query's whole CPU bill
    * (tokenize/explode/multi-distinct), one task does all of it while
    * the other cores idle. Round-robin the rows out first. At real
    * scale a corpus scan has thousands of splits, the guard is false,
    * and the plan is untouched — nothing here is tuned to local mode.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
