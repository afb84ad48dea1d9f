package graft

import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

import graft.plans.BandedLevenshteinRule

/** The injected optimizer rule: banded-Levenshtein rewrite. Three legs —
  * the rewrite FIRES (threshold present in the optimized plan of the
  * registry query that relies on it), the rewrite is SEMANTICS-PRESERVING
  * on the boundary/null/CJK cases (vs the projected un-banded distance,
  * which the rule deliberately does not touch), and the guard HOLDS
  * (non-literal bounds stay un-banded — d11's length-relative form).
  */
class RuleSpec extends SparkSpec {

  test("rewrite fires on d12's naive predicate") {
    val plan = SparkEntry.queries("d12_edit_prefilter")(spark, sf)
      .queryExecution.optimizedPlan
    val levs = plan.collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case l: Levenshtein => l })
    assert(levs.nonEmpty, "no levenshtein left in d12's plan at all")
    assert(levs.forall(_.threshold.isDefined),
      s"un-banded levenshtein survived the rule: $levs")
  }

  test("j11: the verify predicate bands, the reported distance stays exact") {
    val plan = SparkEntry.queries("j11_fuzzy_name_match")(spark, sf)
      .queryExecution.optimizedPlan
    val levs = plan.collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case l: Levenshtein => l })
    assert(levs.exists(_.threshold.isDefined),
      "j11's lev <= 4 filter was not rewritten to the banded kernel")
    assert(levs.exists(_.threshold.isEmpty),
      "j11's output distance column must stay un-banded (true distance)")
  }

  test("rewrite preserves semantics at the boundary, on nulls and CJK") {
    val sess = spark
    import sess.implicits._
    // pairs straddling k=3: d=0, d=3 (keep), d=4 (drop), plus null and
    // supplementary/CJK text where code-unit vs code-point bugs surface
    val rows: Seq[(String, String)] = Seq(
      ("kitten", "kitten"),          // 0
      ("kitten", "sitting"),         // 3 — boundary keep
      ("kitten", "sittings"),        // 4 — boundary drop
      ("", "abc"),                   // 3
      ("", "abcd"),                  // 4
      ("中文文档相同", "中文文档不同"),   // CJK, d=2
      (null, "x"),                   // null → predicate null → dropped
      ("𝒜𝒜𝒜", "𝒜𝒜ℬ"))               // supplementary plane, d=1
    val df = rows.toDF("a", "b")
    // the PREDICATE is rewritten by the session rule; the PROJECTED
    // 2-arg distance is not (no comparison shape) — so filtering by one
    // and checking against the other compares banded vs full DP
    val kept = df.filter(levenshtein($"a", $"b") <= 3)
      .select($"a", $"b", levenshtein($"a", $"b").as("d")).collect()
    assert(kept.forall(_.getInt(2) <= 3))
    assert(kept.length == 5, s"expected 5 survivors, got ${kept.toSeq}")
    // strict < and flipped forms agree with the un-banded reference too
    val lt = df.filter(levenshtein($"a", $"b") < 4).count()
    val flipped = df.filter(lit(3) >= levenshtein($"a", $"b")).count()
    assert(lt == 5 && flipped == 5)
  }

  test("guard: non-literal bounds stay un-banded") {
    // parquet-backed input (a local relation would be constant-folded
    // whole); d11's length-relative shape — the bound is per-row
    val df = graft.etl.Tables.table(spark, sf, "documents")
      .filter(levenshtein(col("text"), col("source"))
        <= length(col("text")) - 4)
    val levs = df.queryExecution.optimizedPlan.collect { case n => n.expressions }
      .flatten.flatMap(_.collect { case l: Levenshtein => l })
    assert(levs.nonEmpty && levs.forall(_.threshold.isEmpty),
      "per-row bound must not be banded (threshold is per-plan, not per-row)")
  }

  test("d11b: per-pair banded verify emits exactly d11's rows; the band is in the plan") {
    // the production verify leg (r17): the band is an explicit 3-arg
    // call with a PER-ROW threshold column (the rule's guard correctly
    // never produces this — it is written at the call site), and the
    // survivor set must be byte-identical to the un-banded d11
    val plan = SparkEntry.queries("d11b_edit_verify_banded")(spark, sf)
      .queryExecution.optimizedPlan
    val levs = plan.collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case l: Levenshtein => l })
    assert(levs.exists(_.threshold.exists(!_.foldable)),
      "d11b's band must be the per-pair length-relative column")
    // exactly ONE banded DP on the candidate mass (the filter gate —
    // the first cut let pushdown clone it 3×). The un-banded exact DP
    // runs only on band SURVIVORS (the cheap side); pushdown/
    // CollapseProject may clone it up to twice (survivor filter clone +
    // output projection) — pin the CEILING, not the exact count, so a
    // Spark upgrade that collapses the clone doesn't fail the suite
    // with no regression (r17 ADVICE)
    assert(levs.count(_.threshold.isDefined) == 1 &&
      levs.count(_.threshold.isEmpty) <= 2,
      s"d11b DP duplication crept back: $levs")
    for (dir <- sweepDirs(sf)) {
      val banded = SparkEntry.queries("d11b_edit_verify_banded")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val full = SparkEntry.queries("d11_edit_verify")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(banded.nonEmpty && banded == full,
        s"$dir: banded survivors diverge from d11 " +
          s"(banded ${banded.size} rows, full ${full.size})")
    }
  }

  test("rule unit: all four comparison directions rewrite") {
    val sess = spark
    import sess.implicits._
    for (pred <- Seq(
        levenshtein($"a", $"b") <= 3, lit(3) >= levenshtein($"a", $"b"),
        levenshtein($"a", $"b") < 4, lit(4) > levenshtein($"a", $"b"))) {
      val plan = Seq(("x", "y")).toDF("a", "b").filter(pred)
        .queryExecution.optimizedPlan
      val levs = plan.collect { case n => n.expressions }.flatten
        .flatMap(_.collect { case l: Levenshtein => l })
      // constant folding may evaluate the literal pair away entirely;
      // if a levenshtein survives, it must carry the band
      assert(levs.forall(_.threshold.isDefined), s"pred $pred un-banded")
    }
  }
}
