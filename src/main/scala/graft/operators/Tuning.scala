package graft.operators

/** Cross-cutting execution-regime switches.
  *
  * [[noBroadcast]] disables every EXPLICIT broadcast hint the library's
  * join-family operators place (joinBabe's dimension hint, the
  * range/interval equi-join right sides), so the shuffle/SMJ fallback
  * paths the 100 TB story assumes can be exercised and MEASURED on the
  * same queries — at production scale some build sides exceed any
  * broadcast threshold, and a path that has never run is not a fallback.
  * Pair it with `spark.sql.autoBroadcastJoinThreshold=-1` (Bench does
  * this automatically when the env var is set) so Catalyst doesn't
  * re-promote the hint-less joins back to broadcast.
  *
  * Read from the `graft.noBroadcast` system property (tests) or the
  * `SPARK_GRAFT_NO_BROADCAST` environment variable (bench runs); truthy
  * values are "1"/"true". Deliberately a def, not a val: specs flip the
  * property around individual plan assertions.
  */
object Tuning {
  def noBroadcast: Boolean =
    sys.props.get("graft.noBroadcast")
      .orElse(sys.env.get("SPARK_GRAFT_NO_BROADCAST"))
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
}
