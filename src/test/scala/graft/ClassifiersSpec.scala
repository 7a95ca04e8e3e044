package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Classifiers._

/** Pins the classifier layer (C1-C5, F1-F3, P1) to the reference semantics
  * (reference: index.js:11-14, 179-187, 218-238, 280-293; fixtures at
  * test/tests.js:32-36).
  */
class ClassifiersSpec extends SparkSpec {
  import spark.implicits._

  /** Evaluate a single-string-input Column expression against one value. */
  private def evalStr(value: String, expr: Column => Column): Any =
    Seq(Option(value)).toDF("v").select(expr(col("v"))).collect()(0).get(0)

  // --- C1 isIP (reference test/tests.js:32-36) ---------------------------
  test("isIP: IPv6 uppercase-hex groups match") {
    assert(evalStr("2A02:27B0:4400:33F0:E0FF:19DF:B401:9559", isIP) == true)
  }
  test("isIP: named user does not match") {
    assert(evalStr("Jdlrobson", isIP) == false)
  }
  test("isIP: IPv4 dotted quad matches") {
    assert(evalStr("192.168.0.1", isIP) == true)
  }
  test("isIP: loose regex matches IP substring anywhere (reference parity)") {
    // The reference regex is unanchored — a name containing an IP matches.
    assert(evalStr("user 1.2.3.4 suffix", isIP) == true)
  }

  // --- C2 isRevert (index.js:179-187) ------------------------------------
  test("isRevert: each keyword fires case-insensitively") {
    for (kw <- Seq("Tag: something", "Undid revision 123", "REVERTED vandalism",
                   "reverting to previous", "per WP:BOLD", "revert"))
      assert(evalStr(kw, isRevert) == true, s"expected revert: $kw")
    assert(evalStr("a plain copyedit", isRevert) == false)
    assert(evalStr(null, isRevert) == false)
  }

  // --- C3 isBotEdit (index.js:280-284) -----------------------------------
  test("isBotEdit: bot flag or ClueBot NG allowlist") {
    val df = Seq(
      (Some(true), "Alice"), (Some(false), "ClueBot NG"),
      (Some(false), "Bob"), (None: Option[Boolean], "Carol"))
      .toDF("bot", "user")
    val got = df.select(isBotEdit(col("bot"), col("user"))).collect().map(_.getBoolean(0))
    assert(got.toSeq == Seq(true, true, false, false))
  }

  // --- C4 notability (index.js:218-227) ----------------------------------
  test("notability: 0/1 per event even with multiple keywords") {
    assert(evalStr("added eventtag here", notabilityHit) == 1L)
    // Two keywords, ONE flag increment (single ++ behind the OR-chain).
    assert(evalStr("current event and ongoing event", notabilityHit) == 1L)
    // Comment is lower-cased first, so the capital-D '→Death' keyword can
    // never match — faithful reference bug (index.js:219,223).
    assert(evalStr("→Death of X", notabilityHit) == 0L)
    assert(evalStr("→death of X", notabilityHit) == 0L)
  }

  // --- C5 volatility (index.js:229-238) ----------------------------------
  test("volatility: AfD fixture sets exactly 1 (test/tests.js:124-134)") {
    assert(evalStr("Nominated page for deletion", volatilityHit) == 1L)
  }
  test("volatility: single keywords") {
    assert(evalStr("tagged for speedy deletion", volatilityHit) == 1L)
    assert(evalStr("{{pp-vandalism}} applied", volatilityHit) == 1L)
    assert(evalStr("harmless comment", volatilityHit) == 0L)
  }

  // --- F3 fixup (index.js:291-293) ---------------------------------------
  test("isFixup: case-sensitive 'Fixed error'") {
    assert(evalStr("Fixed error in infobox", isFixup) == true)
    assert(evalStr("fixed error in infobox", isFixup) == false)
  }

  // --- page id (index.js:436-449) ----------------------------------------
  test("pageId: bare title for enwiki, wiki/title otherwise") {
    val df = Seq(("enwiki", "Foo"), ("dewiki", "Bar")).toDF("wiki", "title")
    val got = df.select(pageId(col("wiki"), col("title"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("Foo", "dewiki/Bar"))
  }

  // --- property: classifier columns agree with a direct Scala model ------
  test("property: classifier columns == Scala model on generated strings") {
    // Mix of arbitrary unicode and keyword-seeded strings so matches occur.
    val word = Gen.oneOf(revertKeywords ++ notabilityKeywords ++
      volatilityKeywords ++ Seq("plain", "Copyedit", "WP:NPOV", "Tag: x"))
    val gen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOfN(4, word).map(_.mkString(" ")),
      word.flatMap(w => Gen.asciiPrintableStr.map(s => s + w.toUpperCase)))
    val samples = (0 until 300).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))).distinct

    val revertModel = (s: String) => revertKeywords.exists(s.toLowerCase.contains)
    val notabModel = (s: String) =>
      if (notabilityKeywords.exists(s.toLowerCase.contains)) 1L else 0L
    val volatModel = (s: String) =>
      if (volatilityKeywords.exists(s.toLowerCase.contains)) 1L else 0L

    val got = samples.toDF("v")
      .select(col("v"), isRevert(col("v")).as("r"),
        notabilityHit(col("v")).as("n"), volatilityHit(col("v")).as("q"))
      .collect()
    got.foreach { row =>
      val s = row.getString(0)
      assert(row.getBoolean(1) == revertModel(s), s"isRevert mismatch: '$s'")
      assert(row.getLong(2) == notabModel(s), s"notability mismatch: '$s'")
      assert(row.getLong(3) == volatModel(s), s"volatility mismatch: '$s'")
    }
  }
}
