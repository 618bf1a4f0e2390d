package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism normalization (optimization guide §2.4/§2.6).
  *
  * A per-row-heavy pipeline is only as parallel as its narrowest upstream
  * stage, and a stage's width is set by the SOURCE when no exchange sits in
  * between: a table stored as one file with one row group yields exactly ONE
  * scan split, so everything fused above it — explodes, joins against
  * broadcast sides, expression-heavy projections — runs on one core no
  * matter how many the session has (measured r17: q_fato_vendas 6.0 s of
  * summed task time in 6.4 s of wall on local[32]; q_tokenize_artifact
  * 6.8 s in 7.1 s).
  *
  * [[fanOut]] inserts one hash exchange to lift such a pipeline to the
  * session's parallelism — and is an exact no-op when the source already
  * provides at least that many partitions, which is the normal state at
  * scale (a 100 TB table is thousands of splits). It is therefore safe to
  * leave in production code paths: the exchange exists exactly when cores
  * would otherwise sit idle, and the bytes it moves are the bytes one core
  * would otherwise process alone.
  */
object Parallelism {

  /** Repartition `df` up to the session's default parallelism when its
    * current physical partitioning is narrower, else return it unchanged.
    *
    *  - `keys` non-empty: hash repartition on the keys — deterministic
    *    row→partition assignment (safe under task retry, guide §2.5; no
    *    sort-before-repartition cost). Pass a high-cardinality key.
    *  - `keys` empty: round-robin repartition (pays the deterministic
    *    local sort Spark inserts before round-robin).
    *
    * Streaming frames are returned unchanged (micro-batch sizing is the
    * refresh loops' own concern — IdempotentFold.sizeBatchShuffle).
    * Results are row-set-identical under any partitioning; callers that
    * derive values from physical placement (spark_partition_id,
    * monotonically_increasing_id) must fan out BEFORE deriving, as the
    * Surrogate helpers do via their own exchanges.
    */
  /** Session kill-switch: the micro-batch fold sessions set this false —
    * a production micro-batch arrives as many files (fan-out is a no-op
    * there anyway), while the gate's tiny batches only pay the exchange +
    * per-call planning for nothing (measured r17: +1-3 s per refresh
    * query). */
  val EnabledConf = "spark.graft.fanout.enabled"

  def fanOut(df: DataFrame, keys: Seq[Column] = Nil): DataFrame = {
    if (df.isStreaming) return df
    val session = df.sparkSession
    if (session.conf.get(EnabledConf, "true") != "true") return df
    // target the session's intended shuffle width, not the raw core count:
    // a caller that sized spark.sql.shuffle.partitions for its batch (the
    // refresh loops' per-batch sizing) must not be overridden upward
    val target = math.min(
      session.sparkContext.defaultParallelism,
      session.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val current = df.rdd.getNumPartitions
    if (current >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
