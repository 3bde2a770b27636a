package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Scrub, TextStats}

/** Corpus-hygiene operator tier (q55–q58): decontamination, repetition,
  * source balancing, boilerplate-segment dedup.
  */
class CorpusOpsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("tokenJsShift: identical snapshots diverge by exactly zero") {
    val snap = Seq(("g1", "a b b c"), ("g1", "c d"), ("g2", "x y"))
      .toDF("grp", "text")
    val out = TextStats.tokenJsShift(snap, snap, "grp", "text")
      .orderBy("grp")
      .select("grp", "js_pico", "n_tok_old", "n_tok_new",
        "n_vocab_old", "n_vocab_new")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("g1", 0L, 6L, 6L, 4L, 4L),
      ("g2", 0L, 2L, 2L, 2L, 2L)))
  }

  test("tokenJsShift: disjoint vocabularies hit the ln 2 ceiling") {
    val a = Seq(("g", "a a b")).toDF("grp", "text")
    val b = Seq(("g", "x y y y")).toDF("grp", "text")
    val row = TextStats.tokenJsShift(a, b, "grp", "text")
      .select("js_div").as[Double].head()
    assert(row == BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"disjoint snapshots must measure the JS maximum ln 2, got $row")
  }

  test("tokenJsShift matches the closed form on a hand fixture") {
    // old: P(a)=3/4, P(b)=1/4 ; new: Q(a)=1/4, Q(b)=3/4
    val a = Seq(("g", "a a a b")).toDF("grp", "text")
    val b = Seq(("g", "a b b b")).toDF("grp", "text")
    val got = TextStats.tokenJsShift(a, b, "grp", "text")
      .select("js_div").as[Double].head()
    def kl(p: Double, m: Double) = p * math.log(p / m)
    val want = 0.5 * (kl(0.75, 0.5) + kl(0.25, 0.5)) +
      0.5 * (kl(0.25, 0.5) + kl(0.75, 0.5))
    assert(math.abs(got - want) < 1e-6, s"got $got want $want")
  }

  test("tokenJsShift: vocabulary deltas surface in the vocab columns") {
    val a = Seq(("g", "a b"), ("g", "c")).toDF("grp", "text")
    val b = Seq(("g", "a b"), ("g", "c d")).toDF("grp", "text")
    val (vOld, vNew, js) = TextStats.tokenJsShift(a, b, "grp", "text")
      .select("n_vocab_old", "n_vocab_new", "js_pico")
      .as[(Long, Long, Long)].head()
    assert((vOld, vNew) == (3L, 4L))
    assert(js > 0, "an added token is a positive divergence")
  }

  test("cmTokenJsShift: identical snapshots bound at exactly zero") {
    val snap = Seq(("g1", "a b b c"), ("g2", "x y")).toDF("grp", "text")
    val out = TextStats.cmTokenJsShift(snap, snap, "grp", "text", 3, 97)
      .orderBy("grp")
      .select("grp", "js_cm_pico", "n_tok_old", "n_tok_new")
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("g1", 0L, 4L, 4L), ("g2", 0L, 2L, 2L)))
  }

  test("cmTokenJsShift is a DPI lower bound on the exact divergence") {
    // a real shift with enough vocab that rows could collide: the bound
    // must never exceed the exact value, whatever the hash layout
    val a = (1 to 40).map(i => ("g", s"tok$i tok${i % 7} filler common"))
      .toDF("grp", "text")
    val b = (25 to 70).map(i => ("g", s"tok$i tok${i % 5} other common"))
      .toDF("grp", "text")
    val exact = TextStats.tokenJsShift(a, b, "grp", "text")
      .select("js_pico").as[Long].head()
    for (w <- Seq(11, 97, 1021)) {
      val bound = TextStats.cmTokenJsShift(a, b, "grp", "text", 4, w)
        .select("js_cm_pico").as[Long].head()
      // pico rounding can differ by at most one ulp per occupied bucket
      assert(bound <= exact + 2 * w,
        s"w=$w: DPI bound $bound must not exceed exact $exact")
      assert(bound > 0, s"w=$w: a real shift must register a positive bound")
    }
  }

  test("cmTokenJsShift: collision-free sketch recovers the exact value") {
    // tiny vocab, huge w: every token occupies its own bucket in every
    // row w.h.p. — then the cell distribution IS the token distribution
    // and the bound is tight (up to per-token pico rounding)
    val a = Seq(("g", "a a a b")).toDF("grp", "text")
    val b = Seq(("g", "a b b b")).toDF("grp", "text")
    val exact = TextStats.tokenJsShift(a, b, "grp", "text")
      .select("js_pico").as[Long].head()
    val bound = TextStats.cmTokenJsShift(a, b, "grp", "text", 4, 8191)
      .select("js_cm_pico").as[Long].head()
    assert(math.abs(bound - exact) <= 4,
      s"collision-free bound $bound must match exact $exact")
  }

  test("tokenJsMovers: movers are the rollup's own largest rows") {
    val a = Seq(("g", "a a a a b b c d")).toDF("grp", "text")
    val b = Seq(("g", "a b b b b c d e")).toDF("grp", "text")
    val movers = TextStats.tokenJsMovers(a, b, "grp", "text", 2)
      .orderBy("rank")
      .select("tok", "cnt_old", "cnt_new", "pico", "rank")
      .as[(String, Long, Long, Long, Int)].collect()
    assert(movers.length == 2)
    // a: 4→1 (0.060) and the BRAND-NEW e (one-sided ½·q·ln 2 ≈ 0.043)
    // outrank b's 2→4 (0.021): new vocabulary is a louder mover than a
    // same-direction count shift of equal magnitude
    assert(movers.map(_._1).toSeq == Seq("a", "e"))
    assert(movers.forall(_._4 > 0))
    // each mover's pico is a row of the rollup's sum: all contributions
    // (movers at k = vocab) must sum to exactly js_pico
    val total = TextStats.tokenJsShift(a, b, "grp", "text")
      .select("js_pico").as[Long].head()
    val allRows = TextStats.tokenJsMovers(a, b, "grp", "text", 100)
      .select("pico").as[Long].collect()
    assert(allRows.sum == total,
      "movers must be the exact rows of the rollup's sum")
  }

  test("one-sided groups surface at the ln 2 boundary in both JS paths") {
    // group "gone" exists only in the old snapshot, "new" only in the
    // new one — a dropped and an arrived source; neither may vanish
    val a = Seq(("both", "a b"), ("gone", "x x y")).toDF("grp", "text")
    val b = Seq(("both", "a b"), ("new", "z w")).toDF("grp", "text")
    // a one-sided group has only ONE KL term (the empty side is the
    // zero measure, not a distribution), so the formula's natural
    // extension reports ½·ln 2 — still the documented maximum for that
    // shape, distinct from ln 2 (two DISJOINT distributions)
    val half = BigDecimal(0.5 * math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exact = TextStats.tokenJsShift(a, b, "grp", "text")
      .select("grp", "js_div").as[(String, Double)].collect().toMap
    assert(exact.keySet == Set("both", "gone", "new"))
    assert(exact("both") == 0.0 && exact("gone") == half &&
      exact("new") == half)
    val cm = TextStats.cmTokenJsShift(a, b, "grp", "text", 3, 97)
      .select("grp", "js_cm").as[(String, Double)].collect().toMap
    assert(cm.keySet == Set("both", "gone", "new"),
      "a one-sided group must not vanish from the sketch path")
    assert(cm("both") == 0.0 && cm("gone") == half && cm("new") == half)
  }

  test("contaminatedIds flags exactly the docs sharing a k-gram with eval") {
    val eval = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "prefix words then quick brown fox jumps over suffix"), // 5-gram hit
      (11L, "quick brown fox and nothing else here"),               // only 3 shared
      (12L, "completely unrelated text about spark plans")
    ).toDF("doc_id", "text")
    val flagged = Dedup.contaminatedIds(train, eval, "text", "doc_id", k = 5)
      .as[Long].collect().sorted
    assert(flagged.toSeq == Seq(10L))
  }

  test("contaminationStats: per-width hit counts, short spans miss the wide k") {
    val eval = Seq((1L, "a b c d e f g h i j k l m n o p q r s t"))
      .toDF("doc_id", "text")
    val train = Seq(
      // 10-token verbatim span: 8-grams hit, no 13-gram possible
      (10L, "xx yy c d e f g h i j k l zz"),
      // 16-token verbatim span: hits both widths
      (11L, "xx b c d e f g h i j k l m n o p q yy"),
      (12L, "totally unrelated words only here")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .contaminationStats(train, eval, "text", "doc_id", Seq(8, 13))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // doc 10: span c..l = 10 tokens -> 3 of its 8-grams are eval 8-grams
    assert(out((10L, 8)) == 3)
    assert(!out.contains((10L, 13)))
    // doc 11: span b..q = 16 tokens -> 9 eval 8-grams, 4 eval 13-grams
    assert(out((11L, 8)) == 9)
    assert(out((11L, 13)) == 4)
    assert(!out.exists(_._1._1 == 12L))
  }

  test("repetitionColumns: doubled text has the predicted ratio; distinct text ~0") {
    val base = "alpha beta gamma delta epsilon zeta"
    val df = Seq((1L, base), (2L, s"$base $base")).toDF("doc_id", "text")
    val cols = TextStats.repetitionColumns("text", 3).map { case (n, c) => c.as(n) }
    val out = df.select(col("doc_id") +: cols: _*).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 4 && out(1L).getLong(2) == 4)
    assert(out(1L).getDouble(3) == 0.0)
    // doubled: 12 tokens -> 10 grams; distinct = 4 originals + 2 seam
    // grams (zeta alpha beta / epsilon zeta alpha) = 6; ratio = 0.4
    assert(out(2L).getLong(1) == 10 && out(2L).getLong(2) == 6)
    assert(math.abs(out(2L).getDouble(3) - 0.4) < 1e-9)
  }

  test("balancedSample: every group lands near the smallest group's size") {
    // skewed corpus: group a = 1000 keys, b = 100, c = 100
    val df = ((1 to 1000).map(i => (i.toLong, "a")) ++
      (2001 to 2100).map(i => (i.toLong, "b")) ++
      (3001 to 3100).map(i => (i.toLong, "c"))).toDF("k", "g")
    val kept = Curation.balancedSample(df, "k", "g")
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // threshold for the min group = exactly 1e6 -> keep all of it
    assert(kept("b") == 100 && kept("c") == 100)
    // the big group's keep-rate is 0.1: hash-binomial around 100
    assert(kept("a") > 60 && kept("a") < 140, s"got ${kept("a")}")
    // deterministic: a second run keeps the identical set
    val again = Curation.balancedSample(df, "k", "g")
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("boilerplateStats: shared footers counted per doc, text digested map-side") {
    val docs = (1 to 10).map { i =>
      val footer = if (i <= 6) "\nshared footer line" else ""
      (i.toLong, s"unique body number $i$footer")
    }.toDF("doc_id", "text")
    val out = Dedup.boilerplateStats(docs, "doc_id", "text", "\n", minDocs = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2 && out(1L).getLong(2) == 1)
    assert(math.abs(out(1L).getDouble(3) - 0.5) < 1e-9)
    assert(out(7L).getLong(1) == 1 && out(7L).getLong(2) == 0)
  }

  test("piiColumns: counts and redactions per pattern, clean text untouched") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org or bob@x.io thanks"),
      (2L, "call 555-123-4567 or 555.987.6543 from 10.0.0.1"),
      (3L, "no pii in this perfectly ordinary sentence")
    ).toDF("doc_id", "text")
    val cols = Scrub.piiColumns(col("text")).map { case (n, c) => c.as(n) }
    val out = df.select(col("doc_id") +: cols: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2 && out(1L).getLong(4) == 2)
    assert(out(1L).getString(5) == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(out(2L).getLong(2) == 2 && out(2L).getLong(3) == 1
      && out(2L).getLong(4) == 3)
    assert(out(2L).getString(5) == "call <PHONE> or <PHONE> from <IP>")
    assert(out(3L).getLong(4) == 0)
    assert(out(3L).getString(5) == "no pii in this perfectly ordinary sentence")
  }

  test("domainFilter: exact host and any-subdomain matches drop, others keep") {
    val df = Seq(
      (1L, "https://ads.example.com/x"),          // exact block
      (2L, "https://cdn.ads.example.com/y"),      // subdomain block
      (3L, "https://example.com/z"),              // parent NOT blocked
      (4L, "https://goodsite.org/a?q=1"),         // clean
      (5L, "https://notads.example.com/b"),       // 'notads' != 'ads' label
      (6L, "HTTPS://Ads.Example.COM/mixed"),      // hosts are case-insensitive
      (7L, "https://CDN.ADS.EXAMPLE.COM/up")      // ...in any label
    ).toDF("doc_id", "url")
    val block = Seq("ads.example.com").toDF("domain")
    val kept = Scrub.domainFilter(df, "url", "doc_id", block)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(3L, 4L, 5L))
  }

  test("hostSuffixChain covers every dot suffix") {
    val chain = Seq(Tuple1("a.b.c.d")).toDF("h")
      .select(Scrub.hostSuffixChain(col("h")).as("c"))
      .as[Seq[String]].head()
    assert(chain == Seq("a.b.c.d", "b.c.d", "c.d", "d"))
  }

  test("temperatureThreshold: monotone in group size and alpha, exact endpoints") {
    val sizes = Seq(25L, 50L, 200L, 1000L)
    def thrs(alpha: Double): Seq[Long] =
      sizes.toDF("n")
        .select(Curation.temperatureThreshold(col("n"), lit(25L), alpha).as("t"))
        .as[Long].collect().toSeq
    val a0 = thrs(0.0); val a3 = thrs(0.3); val a7 = thrs(0.7); val a1 = thrs(1.0)
    // α=1 keeps everything; α=0 flattens to exact nmin/n millionths
    assert(a1.forall(_ == 1000000L))
    assert(a0 == Seq(1000000L, 500000L, 125000L, 25000L))
    // keep-rate is monotone non-increasing in group size for every α...
    Seq(a0, a3, a7, a1).foreach(t => assert(t == t.sorted.reverse, t.toString))
    // ...and monotone non-decreasing in α for every group
    sizes.indices.foreach { i =>
      assert(a0(i) <= a3(i) && a3(i) <= a7(i) && a7(i) <= a1(i),
        s"size=${sizes(i)}: ${Seq(a0(i), a3(i), a7(i), a1(i))}")
    }
  }

  test("temperatureSample at α=0.7 keeps more of a big group than balanced, less than all") {
    val df = ((1 to 800).map(i => (i.toLong, "big")) ++
      (9001 to 9100).map(i => (i.toLong, "small"))).toDF("k", "g")
    val kept = Curation.temperatureSample(df, "k", "g", 0.7)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 100) // min group threshold is exactly 1e6
    // rate = (100/800)^0.3 ≈ 0.536: hash-binomial around 429
    assert(kept("big") > 350 && kept("big") < 510, s"got ${kept("big")}")
    // deterministic re-run keeps the identical set
    val again = Curation.temperatureSample(df, "k", "g", 0.7)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
  }

  test("lineRuleColumns: token minimum and terminal punctuation both gate") {
    val df = Seq(
      (1L, "a good long sentence right here.\nnav | bar | menu\nok.\n\nanother proper sentence follows here!"),
      (2L, "no punctuation on this line at all")
    ).toDF("doc_id", "text")
    val cols = Scrub.lineRuleColumns(col("text"), 4).map { case (n, c) => c.as(n) }
    val out = df.select(col("doc_id") +: cols: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: 5 lines; 'nav | bar | menu' lacks punct, 'ok.' too short,
    // empty line fails both -> 2 survivors
    assert(out(1L).getLong(1) == 5 && out(1L).getLong(2) == 2)
    assert(out(1L).getString(3) ==
      "a good long sentence right here.\nanother proper sentence follows here!")
    assert(out(2L).getLong(2) == 0 && out(2L).getString(3) == "")
    // punctuation rule off: token count alone decides
    val lax = Scrub.lineRuleColumns(col("text"), 4, requireTerminalPunct = false)
      .map { case (n, c) => c.as(n) }
    val out2 = df.select(col("doc_id") +: lax: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out2(2L).getLong(2) == 1)
  }

  test("canonicalizeUrl: case, port, tracking, fragment, trailing slash") {
    val cases = Seq(
      // scheme+host lowercase, path case preserved
      "HTTP://WWW.Example.COM/Path/File" -> "http://www.example.com/Path/File",
      // default ports drop; non-default stay
      "https://h.io:443/a" -> "https://h.io/a",
      "http://h.io:80/a" -> "http://h.io/a",
      "https://h.io:8443/a" -> "https://h.io:8443/a",
      // tracking params in every position; real params survive
      "https://h.io/a?utm_source=x&id=7" -> "https://h.io/a?id=7",
      "https://h.io/a?id=7&utm_campaign=y&gclid=z" -> "https://h.io/a?id=7",
      "https://h.io/a?utm_a=1&utm_b=2" -> "https://h.io/a",
      "https://h.io/a?ref=t&ref=u&id=1" -> "https://h.io/a?id=1",
      // tracker NAMES are case-insensitive even though query case is
      // otherwise preserved ('?UTM_Source=x' must collapse too)
      "https://h.io/a?UTM_Source=x&Id=7" -> "https://h.io/a?Id=7",
      "https://h.io/a?id=7&Ref=Home" -> "https://h.io/a?id=7",
      // fragment always drops; trailing slash on non-root path drops
      "https://h.io/a/b/#sec" -> "https://h.io/a/b",
      "https://h.io/a/?id=1#x" -> "https://h.io/a?id=1",
      // root slash is NOT a trailing path slash
      "https://h.io/" -> "https://h.io/",
      // no scheme: passes through untouched
      "not a url" -> "not a url")
    val out = cases.map(_._1).toDF("url")
      .select(Scrub.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq
    out.zip(cases).foreach { case (got, (in, want)) =>
      assert(got == want, s"canonicalizeUrl($in) = $got, want $want")
    }
  }

  test("unigramLogProbScores: common text scores higher than rare text; OOV floors") {
    // 'the cat sat' tokens dominate; doc 3 is all-OOV relative to top-2 vocab
    val df = Seq(
      (1L, "the cat the cat the cat"),
      (2L, "the cat sat here"),
      (3L, "zq xv qj kw"),
      (4L, ""),      // empty and whitespace-only docs are EXCLUDED,
      (5L, "   ")    // not scored as one empty token
    ).toDF("doc_id", "text")
    val out = TextStats.unigramLogProbScores(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1 == 6 && out(2L)._1 == 4 && out(3L)._1 == 4)
    // doc 1 uses only vocab tokens -> best score; doc 3 only OOV -> worst
    assert(out(1L)._2 > out(2L)._2 && out(2L)._2 > out(3L)._2, out.toString)
    // all-OOV doc: every token takes the identical smoothed floor —
    // N = 14 corpus tokens, V = 2: round6(log10(1/(14+2+1))) = -1.230449
    assert(math.abs(out(3L)._2 - (-1.230449)) < 1e-9, out(3L).toString)
  }

  test("SlidingMinExpr == transform/array_min/slice on random arrays incl. short ones") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 60).map { i =>
      val n = 1 + rnd.nextInt(20)
      (i.toLong, Seq.fill(n)(rnd.nextLong() & 0x7fffffffffffffffL))
    }
    for (w <- Seq(1, 3, 4, 7)) {
      val out = rows.toDF("id", "a")
        .select(col("id"),
          graft.functions.SlidingMinExpr.slidingMin(col("a"), w).as("native"),
          transform(
            sequence(lit(1), greatest(size(col("a")) - (w - 1), lit(1))),
            i => array_min(slice(col("a"), i, lit(w)))).as("hof"))
        .collect()
      out.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"w=$w id=${r.getLong(0)}: ${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
      }
    }
  }

  test("winnowing guarantee: docs sharing >= w+k-1 chars share a fingerprint") {
    // the Schleimer et al. guarantee: a shared substring of length
    // >= w + k - 1 (= 11 at k=8, w=4) spans at least one full window
    // of k-gram hashes in BOTH docs, so the window minimum matches
    val (k, w) = (8, 4)
    def fps(text: String): Set[Long] = {
      val df = Seq(Tuple1(text)).toDF("text")
      df.select(graft.functions.RollingHashExpr.rollingHashes(
          TextStats.normalize(col("text")), k).as("rh"))
        .select(array_distinct(transform(
          sequence(lit(1), greatest(size(col("rh")) - (w - 1), lit(1))),
          i => array_min(slice(col("rh"), i, lit(w))))).as("f"))
        .as[Seq[Long]].head().toSet
    }
    val shared = "the shared substring lives here"
    val a = fps(s"aaaa qqq $shared zz ww")
    val b = fps(s"bbbb kkk pp $shared yy xx")
    assert((a & b).nonEmpty, "long shared substring must share a fingerprint")
    val c = fps("completely different content with nothing in common at all")
    assert((a & c).isEmpty, "unrelated docs must not share fingerprints")
  }

  test("bm25Scores: tf raises, length normalizes, no-hit docs absent") {
    val df = Seq(
      (1L, "spark spark spark filler filler filler"),      // tf 3, dl 6
      (2L, "spark filler filler filler filler filler"),    // tf 1, dl 6
      // same tf as doc 2 but twice the length: normalization must
      // score it below doc 2
      (3L, "spark " + Seq.fill(11)("filler").mkString(" ")),
      (4L, "nothing relevant here at all")).toDF("doc_id", "text")
    val out = TextStats.bm25Scores(df, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), "no-hit docs must be absent")
    assert(out(1L)._2 > out(2L)._2, "higher tf must raise the score")
    assert(out(2L)._2 > out(3L)._2, "longer doc at equal tf must score lower")
    assert(out.values.forall(_._1 == 1L), "one matching term per doc")
  }

  test("longestCommonRuns: exact run lengths via diagonal islands; df prune gates") {
    val df = Seq(
      (1L, "p q r s t u v w x y"),
      // shares the verbatim 6-token run "p q r s t u" at a shifted
      // position, plus a 2-token tail ("x y") too short for any k=3 gram
      (2L, "zz p q r s t u kk x y"),
      (3L, "totally different words entirely here")).toDF("doc_id", "text")
    val out = Dedup.longestCommonRuns(df, "text", "doc_id", k = 3, minRun = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // 6 shared tokens = 4 consecutive 3-grams on one diagonal -> 4+2 = 6
    assert(out == Map((1L, 2L) -> 6L), out.toString)
    // two separate shared runs must NOT merge: longest is the larger one
    val df2 = Seq(
      (1L, "a b c d e junk1 junk2 f g h i j"),
      (2L, "a b c d e other words f g h i j")).toDF("doc_id", "text")
    val out2 = Dedup.longestCommonRuns(df2, "text", "doc_id", k = 3, minRun = 3)
      .collect().map(r => r.getLong(2)).toSeq
    assert(out2 == Seq(5L), s"two 5-token runs on different diagonals: $out2")
    // maxDf prune: every (1,2) gram has df 2 > 1 -> no pairs survive
    val pruned = Dedup.longestCommonRuns(df, "text", "doc_id", k = 3,
      minRun = 5, maxDf = 1)
    assert(pruned.count() == 0)
  }

  test("cutCommonRuns: cuts from higher id only, unions overlaps, keeps lowest of three") {
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // three docs share the 6-token span "p q r s t u": doc 1 keeps it,
    // docs 2 and 3 lose it (3 also pairs with 2 — same span, unioned)
    val df = Seq(
      (1L, "p q r s t u v w x y"),
      (2L, "zz p q r s t u kk mm nn"),
      (3L, "aa bb p q r s t u cc dd"),
      (4L, "totally different words entirely here")).toDF("doc_id", "text")
    val out = Dedup.cutCommonRuns(df, "text", "doc_id", k = 3, minRun = 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (0L, md5s("p q r s t u v w x y")), "lowest id untouched")
    assert(out(2L) == (6L, md5s("zz kk mm nn")), out(2L).toString)
    assert(out(3L) == (6L, md5s("aa bb cc dd")), out(3L).toString)
    assert(out(4L) == (0L, md5s("totally different words entirely here")))
    // overlapping spans union, not double-cut: doc 6 shares overlapping
    // runs with 5 covering tokens 1..8 once each
    val df2 = Seq(
      (5L, "a b c d e f g h tail1 tail2"),
      (6L, "a b c d e f g h other words")).toDF("doc_id", "text")
    val out2 = Dedup.cutCommonRuns(df2, "text", "doc_id", k = 3, minRun = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out2(5L)._1 == 0L)
    assert(out2(6L) == (8L, md5s("other words")), out2(6L).toString)
    // a doc that is ENTIRELY a shared span hashes the empty string
    val df3 = Seq(
      (7L, "s1 s2 s3 s4 s5 s6 extra"),
      (8L, "s1 s2 s3 s4 s5 s6")).toDF("doc_id", "text")
    val out3 = Dedup.cutCommonRuns(df3, "text", "doc_id", k = 3, minRun = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out3(8L) == (6L, md5s("")), out3(8L).toString)
  }

  test("bigramLogProbScores ranks coherent word order above scrambled; unigram cannot") {
    // docs 1 and 2 hold the SAME token multiset {a x3, b x3} — unigram
    // scoring is order-blind so it MUST tie them; doc 1 follows the
    // corpus's dominant a-b alternation, doc 2 clumps, so the bigram
    // model must rank 1 above 2
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "b b b a a a"),
      (3L, "a b a b a b"), // reinforce the alternating structure
      (4L, "a b a b a b"),
      (5L, "a b a b a b")).toDF("doc_id", "text")
    val uni = TextStats.unigramLogProbScores(df, "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) == uni(2L), s"unigram is order-blind: $uni")
    val bi = TextStats.bigramLogProbScores(df, "doc_id", "text", 10, 50)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(bi(1L)._3 > bi(2L)._3,
      s"bigram must prefer the coherent order: $bi")
    // doc 1: position 1 backs off, every later position is a table hit
    assert(bi(1L)._1 == 6 && bi(1L)._2 == 5, bi(1L).toString)
  }

  test("domainFilter: inline, broadcast, and shuffle anti-join paths agree") {
    val urls = (1L to 40L).map { i =>
      val host = if (i % 4 == 0) "ads.bad.com"
      else if (i % 4 == 1) "bad.com"
      else s"ok$i.example.org"
      (i, s"https://$host/p/$i")
    }.toDF("doc_id", "url")
    val block = Seq("bad.com").toDF("domain")
    def kept(maxBroadcast: Long, maxInline: Long) =
      Scrub.domainFilter(urls, "url", "doc_id", block, maxBroadcast, maxInline)
        .select("doc_id").as[Long].collect().sorted.toSeq
    val viaInline = kept(Long.MaxValue, Long.MaxValue)
    val viaBroadcast = kept(Long.MaxValue, 0L) // inline gate forces the join path
    val viaShuffle = kept(0L, 0L) // id gate then forces the shuffle anti-join
    assert(viaInline == viaBroadcast)
    assert(viaBroadcast == viaShuffle)
    assert(viaInline == (1L to 40L).filterNot(i => i % 4 == 0 || i % 4 == 1))
  }

  test("dsirWeights: target-vocab docs score positive, off-target negative") {
    // two disjoint vocabularies: target docs speak "alpha beta gamma",
    // non-target docs speak "zeta eta theta"; one mixed doc and one
    // empty doc pin the boundary behavior
    val df = Seq(
      (1L, "alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha gamma", true),
      (3L, "zeta eta theta zeta eta theta", false),
      (4L, "theta eta zeta", false),
      (5L, "alpha beta zeta eta", false), // mixed, not in target set
      (6L, "", false)
    ).toDF("doc_id", "text", "tgt")
    // buckets << corpus tokens is the DSIR operating regime: with
    // buckets >> tokens, add-one smoothing compresses every ratio
    // toward (ct+1)/(cr+1) <= 1 (target is a SUBSET of raw) and the
    // sign stops tracking target-likeness
    val out = Curation.dsirWeights(df, "doc_id", "text", col("tgt"), 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(4))).toMap
    assert(!out.contains(6L), "empty doc must be excluded")
    // target-vocab tokens are relatively MORE frequent under the target
    // distribution; off-target tokens appear 0 times there
    assert(out(1L)._3 && out(1L)._2 > 0, s"pure target doc: ${out(1L)}")
    assert(out(2L)._3, s"pure target doc: ${out(2L)}")
    assert(!out(3L)._3 && out(3L)._2 < 0, s"pure off-target doc: ${out(3L)}")
    assert(!out(4L)._3, s"pure off-target doc: ${out(4L)}")
    // the mixed doc sits between the pure docs on avg_logw
    val avg = (id: Long) => out(id)._2 / out(id)._1
    assert(avg(5L) > avg(3L) && avg(5L) < avg(1L),
      s"mixed doc must rank between pure docs: ${avg(3L)} ${avg(5L)} ${avg(1L)}")
    assert(out(1L)._1 == 5L, "n_tokens counts tokens, not distinct tokens")
  }

  test("chunkDocuments: overlap, truncation, and short-doc behavior") {
    val words = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, words), (2L, "just three tokens")).toDF("doc_id", "text")
    // chunk 4, overlap 1 -> stride 3: anchors 1,4,7 — the last window is
    // the FIRST that reaches the end; an anchor at 10 would emit [10..10],
    // fully contained in [7..10] (the redundant-tail bug)
    val out = TextStats.chunkDocuments(df, "doc_id", "text", 4, 1)
      .orderBy("doc_id", "chunk_idx").collect()
    val doc1 = out.filter(_.getLong(0) == 1L)
    assert(doc1.length == 3)
    assert(doc1(0).getString(2) == "w1 w2 w3 w4")
    assert(doc1(1).getString(2) == "w4 w5 w6 w7") // 1-token overlap
    assert(doc1(2).getString(2) == "w7 w8 w9 w10" && doc1(2).getLong(3) == 4)
    // shorter than one window: a single whole-doc chunk
    val doc2 = out.filter(_.getLong(0) == 2L)
    assert(doc2.length == 1 && doc2(0).getString(2) == "just three tokens")
    assert(doc2(0).getLong(3) == 3)
  }

  test("packingOffsets: bucketed prefix sum equals the naive cumsum; spans correct") {
    // ids deliberately sparse/unsorted-ish across 4 buckets (width 8)
    val docs = Seq((1L, 100L), (2L, 300L), (9L, 200L), (10L, 50L),
      (17L, 500L), (25L, 12L), (26L, 1L)).toDF("id", "toks")
    val out = Curation.packingOffsets(docs, "id", "toks", 256, bucketWidth = 8)
      .orderBy("id").collect()
    // naive expectation
    var cum = 0L
    val want = Seq((1L, 100L), (2L, 300L), (9L, 200L), (10L, 50L),
      (17L, 500L), (25L, 12L), (26L, 1L)).map { case (id, t) =>
      cum += t
      (id, cum, (cum - t) / 256, (cum - 1) / 256)
    }
    out.zip(want).foreach { case (r, (id, end, fw, lw)) =>
      assert(r.getAs[Long]("id") == id)
      assert(r.getAs[Long]("cum_end") == end, s"id=$id")
      assert(r.getAs[Long]("first_window") == fw && r.getAs[Long]("last_window") == lw,
        s"id=$id got (${r.getAs[Long]("first_window")},${r.getAs[Long]("last_window")}) want ($fw,$lw)")
      assert(r.getAs[Long]("n_windows") == lw - fw + 1)
    }
    // doc 2 (tokens 300, offsets 100..400) spans windows 0 and 1
    assert(out(1).getAs[Long]("n_windows") == 2)
  }

  test("canonicalizeUrl is idempotent over randomized messy URLs") {
    // deterministic pseudo-random URL zoo: every combination axis the
    // canonicalizer touches (scheme/host case, default + explicit port,
    // tracking params in all positions, fragment, trailing slash)
    val rnd = new scala.util.Random(42)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val urls = (1 to 200).map { i =>
      val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "HtTpS"))
      val host = pick(Seq("example.com", "Sub.Example.COM", "a.b.c.d.io", "X9.org"))
      val port = pick(Seq("", ":80", ":443", ":8080"))
      val path = pick(Seq("", "/", s"/p$i", s"/A/b$i/", "/x/y/z"))
      val query = pick(Seq("", "?id=1", "?utm_source=a", "?utm_a=1&utm_b=2",
        s"?id=$i&ref=x", "?ref=x&id=2", "?gclid=g&fbclid=f&keep=1"))
      val frag = pick(Seq("", "#top", "#a/b?c"))
      s"$scheme://$host$port$path$query$frag"
    }
    val out = urls.toDF("url")
      .select(Scrub.canonicalizeUrl(col("url")).as("c1"))
      .select(col("c1"), Scrub.canonicalizeUrl(col("c1")).as("c2"))
      .collect()
    out.zip(urls).foreach { case (r, in) =>
      assert(r.getString(0) == r.getString(1),
        s"not a fixed point for $in: ${r.getString(0)} -> ${r.getString(1)}")
    }
  }

  test("byteChunkHashes: tail edit shares all but the affected windows") {
    import graft.operators.Multimodal
    // 32-byte payloads, chunk 8 stride 4 -> 7 windows
    val a = Array.tabulate[Byte](32)(_.toByte)
    val b = a.clone(); b(31) = 99 // last byte differs -> last window only
    val c = a.map(x => (x + 1).toByte) // every window differs
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "bytes")
      .select(col("id"),
        Multimodal.byteChunkHashes(col("bytes"), 8, 4).as("sh"))
    val sh = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(sh(1L).size == 7)
    assert((sh(1L) intersect sh(2L)).size == 6)
    assert((sh(1L) intersect sh(3L)).isEmpty)
    // short payload (< one chunk) hashes as a single whole-payload chunk
    val short = Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "bytes")
      .select(Multimodal.byteChunkHashes(col("bytes"), 8, 4).as("sh"))
      .as[Seq[Long]].head()
    assert(short.size == 1)
    // stride-unaligned length: the tail window covers the final bytes,
    // so an edit past the last grid window still changes the set
    val u1 = Array.tabulate[Byte](34)(_.toByte)
    val u2 = u1.clone(); u2(33) = 99
    val tails = Seq((1L, u1), (2L, u2)).toDF("id", "bytes")
      .select(col("id"), Multimodal.byteChunkHashes(col("bytes"), 8, 4).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(tails(1L) != tails(2L), "tail-only edit must change the shingle set")
    assert((tails(1L) intersect tails(2L)).size == tails(1L).size - 1)
  }

  test("byteChunkHashes: hash engines differ in values, agree in structure") {
    import graft.operators.{Multimodal, TextStats}
    val a = Array.tabulate[Byte](64)(_.toByte)
    val b = a.clone(); b(63) = 77
    val df = Seq((1L, a), (2L, b)).toDF("id", "bytes")
    def sets(mode: TextStats.HashMode) = df
      .select(col("id"), Multimodal.byteChunkHashes(col("bytes"), 8, 4, mode).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val md = sets(TextStats.HashMode.OracleMd5)
    val xx = sets(TextStats.HashMode.EngineXx)
    // different hash values...
    assert(md(1L) != xx(1L))
    // ...identical dedup structure: set sizes and overlap counts match
    assert(md(1L).size == xx(1L).size && md(2L).size == xx(2L).size)
    assert((md(1L) intersect md(2L)).size == (xx(1L) intersect xx(2L)).size)
  }

  test("boilerplateStats separator is literal, not a regex") {
    // '|' as a regex would split on EVERY character boundary (empty
    // alternation); literally it must yield exactly two segments
    val docs = (1 to 5).map(i => (i.toLong, s"unique body $i|shared tail"))
      .toDF("doc_id", "text")
    val out = Dedup.boilerplateStats(docs, "doc_id", "text", "|", minDocs = 5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2, "exactly 2 literal segments")
    assert(out(1L).getLong(2) == 1, "the shared tail is boilerplate")
  }

  test("boilerplateStats segments are whitespace-normalized before digesting") {
    val docs = Seq(
      (1L, "body one\n  Shared   Footer "),
      (2L, "body two\nshared footer"),
      (3L, "body three\nSHARED FOOTER"),
      (4L, "body four\nshared footer"),
      (5L, "body five\nshared footer")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateStats(docs, "doc_id", "text", "\n", minDocs = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // all five footer variants normalize to the same digest
    assert(out.values.forall(_ == 1), out.toString)
  }

  // -------------------------------------------------------------------
  // Next-fit bin packing

  test("nextFitPack fills bins in id order and opens on overflow") {
    val docs = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 50L))
      .toDF("doc_id", "n_tokens")
    val out = Curation.nextFitPack(docs, "doc_id", "n_tokens",
        capacity = 256, bucketWidth = 1000)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // 100+100 fit; +100 would reach 300 > 256 -> new bin; +50 fits there
    assert(out == Seq(
      (1L, 0L, 0L, 0L), (2L, 0L, 0L, 100L),
      (3L, 0L, 1L, 0L), (4L, 0L, 1L, 100L)))
  }

  test("nextFitPack: an oversized doc occupies a bin alone") {
    val docs = Seq((1L, 10L), (2L, 999L), (3L, 10L))
      .toDF("doc_id", "n_tokens")
    val out = Curation.nextFitPack(docs, "doc_id", "n_tokens",
        capacity = 256, bucketWidth = 1000)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L), (2L, 0L, 1L, 0L), (3L, 0L, 2L, 0L)))
  }

  test("nextFitPack bins never cross id-range buckets") {
    val docs = Seq((49L, 10L), (50L, 10L)).toDF("doc_id", "n_tokens")
    val out = Curation.nextFitPack(docs, "doc_id", "n_tokens",
        capacity = 256, bucketWidth = 50)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    // both would fit one bin, but the bucket boundary splits them
    assert(out == Seq((49L, 0L, 0L, 0L), (50L, 1L, 0L, 0L)))
  }

  // -------------------------------------------------------------------
  // Reproducible training-order shuffle

  test("trainShuffle is a complete permutation: every id once, " +
      "positions contiguous from 1 per shard") {
    val docs = (1L to 200L).toDF("doc_id")
    val out = Curation.trainShuffle(docs, "doc_id", seed = 7L, shards = 4)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1).sorted == (1L to 200L))
    assert(out.forall { case (_, seed, shard, _) =>
      seed == 7L && shard >= 0 && shard < 4 })
    out.groupBy(_._3).values.foreach { rows =>
      assert(rows.map(_._4).sorted == (1L to rows.length))
    }
  }

  test("trainShuffle replays bit-identically; a new seed re-permutes") {
    val docs = (1L to 100L).toDF("doc_id")
    def run(seed: Long) =
      Curation.trainShuffle(docs, "doc_id", seed, shards = 4)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._3, r._4)).sortBy(_._1).toSeq
    assert(run(1L) == run(1L))
    // different seed must move SOME ids (hash collision across the
    // whole id set is ~impossible at 60 bits)
    assert(run(1L) != run(2L))
  }

  test("trainShuffle shard order follows the seeded hash, ids break ties") {
    val docs = Seq(5L, 9L, 23L).toDF("doc_id")
    val out = Curation.trainShuffle(docs, "doc_id", seed = 3L, shards = 1)
      .orderBy("pos").as[(Long, Long, Long, Long)].collect().toSeq
    val expected = Seq(5L, 9L, 23L)
      .map(id => id -> graft.functions.Md5Hash60Expr.hash(
        s"3:$id".getBytes("UTF-8")))
      .sortBy { case (id, h) => (h, id) }.map(_._1)
    assert(out.map(_._1) == expected)
  }

  // -------------------------------------------------------------------
  // Incremental dedup against a persisted fingerprint registry

  private def fp(df: org.apache.spark.sql.DataFrame) =
    Dedup.fingerprintRegistry(df, "text", "doc_id",
      k = 3, numHashes = 12, bands = 4, rowsPerBand = 3)

  test("incrementalDedup verdicts: exact copy, near copy, novel doc") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "spark plans fold into whole stage codegen pipelines at runtime"),
      (3L, "completely different third document about something else entirely")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // exact after normalization (case + trailing whitespace)
      (101L, "The QUICK brown fox jumps over the lazy dog near the river bank  "),
      // near: same text + short tail (most shingles shared)
      (102L, "spark plans fold into whole stage codegen pipelines at runtime with aqe"),
      // novel
      (103L, "entirely fresh words that overlap with no registry document at all")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(fp(batch), fp(corpus), "doc_id",
        numHashes = 12, tau = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.toString.toLong))).toMap
    assert(out(101L) == ("exact", Some(1L)), out.toString)
    assert(out(102L)._1 == "near" && out(102L)._2 == Some(2L), out.toString)
    assert(out(103L) == ("unique", None), out.toString)
  }

  test("incrementalDedup est_jaccard is the signature-agreement fraction") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(fp(batch), fp(corpus), "doc_id",
      numHashes = 12, tau = 0.5).collect().head
    // identical text -> identical signature -> estimate exactly 1.0
    assert(out.getString(1) == "exact")
    assert(out.getDouble(3) == 1.0)
  }

  test("incrementalDedup maxBucket caps registry fan-in by ascending id") {
    // three identical registry docs land in identical buckets; cap=1
    // keeps only the lowest registry id as a candidate
    val t = "same exact text in every registry document here repeated words"
    val corpus = Seq((5L, t), (6L, t), (7L, t)).toDF("doc_id", "text")
    val batch = Seq((101L, t + " tail")).toDF("doc_id", "text")
    val capped = Dedup.incrementalDedup(fp(batch), fp(corpus), "doc_id",
      numHashes = 12, tau = 0.25, maxBucket = 1).collect().head
    assert(Option(capped.get(2)).map(_.toString.toLong) == Some(5L),
      s"cap keeps the lowest registry id: $capped")
  }

  test("incrementalDedup intraBatch: same-digest batch twins, registry wins") {
    val corpus = Seq(
      (1L, "registry resident document with its own words here today"))
      .toDF("doc_id", "text")
    val tw = "twin text absent from the registry but duplicated in batch"
    val batch = Seq(
      // twins: digest absent from registry — later id dups the earlier
      (101L, tw), (102L, tw),
      // registry-exact pair: BOTH resolve to the registry id (registry
      // precedence over the intra-batch survivor)
      (103L, "registry resident document with its own words here today"),
      (104L, "Registry RESIDENT document with its own words here today  ")
    ).toDF("doc_id", "text")
    def run(intra: Boolean) =
      Dedup.incrementalDedup(fp(batch), fp(corpus), "doc_id",
          numHashes = 12, tau = 0.5, intraBatch = intra)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), Option(r.get(2)).map(_.toString.toLong))).toMap
    val off = run(intra = false)
    assert(off(101L)._1 == "unique" && off(102L)._1 == "unique",
      s"registry-only scope: both twins novel w.r.t. the corpus: $off")
    val on = run(intra = true)
    assert(on(101L)._1 == "unique", s"earlier twin survives: $on")
    assert(on(102L) == ("exact", Some(101L)),
      s"later twin dups the batch survivor: $on")
    assert(on(103L) == ("exact", Some(1L)) && on(104L) == ("exact", Some(1L)),
      s"registry id outranks the intra-batch survivor: $on")
  }

  test("incrementalDedup near tie-break: max estimate then min registry id") {
    val t = "one two three four five six seven eight nine ten eleven twelve"
    // two identical registry docs: both estimate identically against the
    // near batch doc; the lower id must win
    val corpus = Seq((9L, t), (4L, t)).toDF("doc_id", "text")
    val batch = Seq((101L, t + " extra")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(fp(batch), fp(corpus), "doc_id",
      numHashes = 12, tau = 0.25).collect().head
    assert(out.getString(1) == "near")
    assert(out.get(2).toString.toLong == 4L, out.toString)
  }
}
