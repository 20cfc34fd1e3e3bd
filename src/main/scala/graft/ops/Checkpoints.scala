package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-truncation backend for the iterative operators (Components,
  * PageRank, LabelProp, KCore, Bpe). Every per-round frame in an
  * iterative job MUST cut its lineage — otherwise round N's plan nests
  * rounds 1..N-1 and the optimizer re-analyzes an exponentially
  * growing tree — but HOW it cuts is a deployment decision:
  *
  * - `localCheckpoint(true)` stores the materialized blocks on
  *   executors with NO replication. Fast (no FS round-trip) and
  *   correct on local[32], but at cluster scale a single executor
  *   loss makes the blocks unrecoverable: the lineage was truncated,
  *   so Spark cannot recompute them, and the whole iterative job dies.
  * - `df.checkpoint()` (reliable) writes the RDD to the configured
  *   checkpoint directory (HDFS/object store on a real cluster).
  *   Executor loss is then survivable — tasks refetch from the store.
  *   That is the 100 TB posture: a 1000-executor PageRank losing one
  *   node should lose one task's worth of work, not twenty rounds.
  *
  * `cut` picks reliable when a checkpoint dir is configured
  * (`spark.graft.checkpoint.dir` conf, else the
  * `SPARK_GRAFT_CHECKPOINT_DIR` env var), else local — so the harness
  * stays fast by default and a cluster deployment flips one setting
  * without touching any operator. Both paths are EAGER and both
  * preserve the child's output partitioning (Spark's
  * `Dataset.checkpoint` builds the LogicalRDD via
  * `LogicalRDD.fromDataset`, which captures partitioning metadata —
  * the property LabelProp/PageRank rely on to pay their edge shuffle
  * once).
  */
object Checkpoints {

  /** Reliable-checkpoint dir, if one is configured for this session. */
  def reliableDir(spark: SparkSession): Option[String] =
    spark.conf
      .getOption("spark.graft.checkpoint.dir")
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
      .filter(_.trim.nonEmpty)

  /** Eagerly materialize `df` and truncate its lineage, via the
    * configured backend (see object scaladoc). Always safe to call in
    * place of `localCheckpoint(true)`.
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    reliableDir(spark) match {
      case Some(dir) =>
        // setCheckpointDir appends a fresh UUID subdir each call — set
        // once per context (changing the conf mid-session therefore
        // needs a new session, which is how Spark itself behaves).
        val sc = spark.sparkContext
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint()
      case None =>
        df.localCheckpoint(true)
    }
  }

  /** Syntax: `df.cutLineage()` reads like the `localCheckpoint` call it
    * replaces at the 19 iterative call sites. */
  implicit class CutOps(private val df: DataFrame) {
    def cutLineage(): DataFrame = cut(df)
  }

  /** Release the storage behind a frame produced by `cut` once a newer
    * round supersedes it. For the local backend this unpersists the
    * executor blocks (the only way to free them — see
    * GraftShim.unpersistCheckpoint); for the reliable backend the
    * blocks live in the checkpoint dir and unpersist(false) of the
    * in-memory copy is a harmless no-op on durability.
    */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graftshim.GraftShim.unpersistCheckpoint(df)
}
