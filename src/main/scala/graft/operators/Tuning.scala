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

  /** Opt-in stage-attribution metrics on the HOT candidate stream
    * (minhashPairs' verify-stage candidate count). A `CollectMetrics`
    * node is a pushdown BARRIER: Catalyst must not move a filter through
    * it (the count would change), so an always-on observe between
    * candidate generation and a caller's selective filter disables the
    * pushdown that makes recall-gate-shaped queries cheap — measured at
    * sf10, the observe cost q61 a 2.5× inflation (8 → 22 s) because its
    * `id_b = id_a + offset` filter stopped reaching the band self-join
    * and all 27.3M candidates flowed through the shingle verify. Default
    * OFF; graft.Probe flips it on for attribution runs. Side-channel
    * observes (dropped-bucket/shingle/fingerprint volumes) hang off
    * count-only aggregate branches, never the candidate stream, and stay
    * unconditional.
    */
  def observeMetrics: Boolean =
    sys.props.get("graft.observeMetrics")
      .orElse(sys.env.get("SPARK_GRAFT_OBSERVE"))
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
}
