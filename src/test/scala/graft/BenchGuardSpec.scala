package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench slow-query guard (round-11, after a 658 s query landed in a
  * committed snapshot unremarked): pure-function laws over
  * [[Bench.slowUnremarked]] and [[Bench.shortKeys]] — no Spark session.
  */
class BenchGuardSpec extends AnyFunSuite {

  private val plans =
    """# PLANS
      |## q29_typedetect — two-pass floor
      |justification prose...
      |slow-budget: q29_typedetect 4.0
      |slow-budget: q999_documented_monster 700
      |slow-budget: malformed
      |slow-budget: q777_bad notanumber
      |""".stripMargin

  test("guard trips on a deliberately slowed query with no budget") {
    val offenders = Bench.slowUnremarked(
      Seq("q01_fast" -> 0.2, "q193_winnow_stream" -> 658.5), 5.0, plans)
    assert(offenders == Seq(("q193_winnow_stream", 658.5, 5.0)))
  }

  test("a committed slow-budget line exempts the query up to its budget") {
    // within budget: silent; above budget: trips with the budget as limit
    assert(Bench.slowUnremarked(
      Seq("q999_documented_monster" -> 650.0), 5.0, plans).isEmpty)
    assert(Bench.slowUnremarked(
      Seq("q999_documented_monster" -> 701.0), 5.0, plans) ==
      Seq(("q999_documented_monster", 701.0, 700.0)))
  }

  test("a budget can only raise the limit, never tighten below the default") {
    // q29's 4.0 budget is below the 5.0 default — the default wins
    assert(Bench.slowUnremarked(Seq("q29_typedetect" -> 4.5), 5.0, plans).isEmpty)
    assert(Bench.slowUnremarked(Seq("q29_typedetect" -> 5.5), 5.0, plans) ==
      Seq(("q29_typedetect", 5.5, 5.0)))
  }

  test("malformed budget lines are ignored, empty PLANS text means no budgets") {
    assert(Bench.slowUnremarked(Seq("q777_bad" -> 6.0), 5.0, plans) ==
      Seq(("q777_bad", 6.0, 5.0)))
    assert(Bench.slowUnremarked(Seq("q01_x" -> 6.0), 5.0, "") ==
      Seq(("q01_x", 6.0, 5.0)))
  }

  test("a red guard quarantines the snapshot instead of owning the canonical name") {
    // round 12: a run with a non-empty slow_unremarked must never write
    // BENCH_local_<sf>.json — it gets the .rejected.json quarantine suffix
    assert(Bench.snapshotSuffix(Nil) == ".json")
    assert(Bench.snapshotSuffix(Seq(("q154_minhash_dedup_portable", 16.32, 5.0))) ==
      ".rejected.json")
  }

  test("shortKeys shortens to the q-number prefix only when unambiguous") {
    val ok = Bench.shortKeys(Seq("q01_filter", "q02_rename"))
    assert(ok == Map("q01_filter" -> "q01", "q02_rename" -> "q02"))
    // two queries sharing a q-number prefix: full names, nothing shadowed
    val clash = Bench.shortKeys(Seq("q01_filter", "q01_other"))
    assert(clash == Map("q01_filter" -> "q01_filter", "q01_other" -> "q01_other"))
  }
}
