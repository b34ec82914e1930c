package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative loops (connected components, PageRank):
  * EAGER `localCheckpoint` by default — each round's plan stays a
  * constant-size RDD leaf (the round-13 flat-plan discipline), blocks
  * live on local executors — with a config-keyed RELIABLE-checkpoint
  * escape hatch for the 100 TB posture: localCheckpoint blocks do not
  * survive executor loss, so on a real cluster a lost executor kills
  * the job mid-iteration. Setting
  *
  *   spark.graft.reliableCheckpoint=true
  *
  * plus a `sparkContext.setCheckpointDir(...)` routes every loop cut
  * through `Dataset.checkpoint()` (replicated-store-backed, survives
  * executor loss) at the documented I/O cost per round. This is a
  * DEPLOYMENT decision, not a tuning knob: results are identical
  * either way (OpsSpec pins it), local runs keep the cheap default,
  * and the flag is read per cut so a session can scope it around one
  * fragile job.
  */
object Checkpoints {
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = spark.conf
      .getOption("spark.graft.reliableCheckpoint")
      .exists(_.equalsIgnoreCase("true")) &&
      spark.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }
}
