package graft

import org.apache.spark.sql.functions._
import graft.ops.LangModel

/** Model-based quality filtering semantics: LM coverage scoring and the
  * hashed linear classifier (the behaviors the hash gates can't show —
  * that the scores actually DISCRIMINATE).
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigrams: adjacency, order, and the short-doc guard (sequence " +
      "would DESCEND on one-token docs)") {
    val got = Seq("a b c", "solo", "").toDF("text")
      .select(LangModel.bigrams($"text").as("g"))
      .as[Seq[String]].collect().toList
    assert(got == List(Seq("a b", "b c"), Seq(), Seq()))
  }

  test("LM coverage: reference-like docs land in the head, gibberish in " +
      "the tail, OOV counts the unknown bigrams") {
    val fluent = (1L to 20L).map(i => (i, "the cat sat on the mat again"))
    val gibber = (21L to 24L).map(i => (i, s"zxq$i qzx$i xqz$i wvu$i"))
    val docs = (fluent ++ gibber).toDF("doc_id", "text")
    val lm = LangModel.bigramLm(docs.filter($"doc_id" <= 10), "text", 100)
    val scored = LangModel.coverageScore(docs, "doc_id", "text", lm)
      .withColumn("bucket",
        LangModel.coverageBucket($"fluency_x100", 300L, 150L))
      .select($"doc_id", $"oov_bigrams", $"bucket")
      .as[(Long, Long, String)].collect()
    val byId = scored.map(r => r._1 -> r).toMap
    assert((1L to 20L).forall(byId(_)._3 == "head"),
      s"reference-like docs score head: ${scored.toList}")
    assert((21L to 24L).forall(byId(_)._3 == "tail"),
      "gibberish (every bigram OOV, magnitude 1 each) lands in the tail")
    assert(byId(21L)._2 == 3L, "4 unique tokens -> 3 bigrams, all OOV")
    assert(byId(1L)._2 == 0L, "in-reference doc has zero OOV bigrams")
  }

  test("vocabulary cap binds: a capped LM scores rare bigrams as OOV") {
    val docs = ((1L to 9L).map(i => (i, "common pair common pair")) ++
      Seq((10L, "rare couple here"))).toDF("doc_id", "text")
    val lmFull = LangModel.bigramLm(docs, "text", 100)
    val lmTiny = LangModel.bigramLm(docs, "text", 1)
    assert(lmTiny.count() == 1 && lmFull.count() > 1)
    val top = lmTiny.select($"gram").as[String].head()
    assert(top == "common pair", "cap keeps the highest-count gram")
    val oov = LangModel.coverageScore(docs, "doc_id", "text", lmTiny)
      .filter($"doc_id" === 10L).select($"oov_bigrams").as[Long].head()
    assert(oov == 2L, "rare doc is all-OOV under the capped LM")
  }

  test("hashed classifier separates constructed classes and inference " +
      "stays a narrow zero-shuffle fold") {
    val pos = (1L to 30L).map(i =>
      (i, s"excellent prose quality writing flows nicely sample$i"))
    val neg = (31L to 60L).map(i =>
      (i, s"buy cheap pills casino winner click spam$i"))
    val docs = (pos ++ neg).toDF("doc_id", "text")
    val w = LangModel.trainHashedClassifier(docs, "text",
      $"doc_id" <= 30L, buckets = 64)
    assert(w.length == 64)
    val scored = LangModel.linearScore(docs, "doc_id", "text", w)
      .select($"doc_id", $"score_num").as[(Long, Long)].collect().toMap
    assert((1L to 30L).forall(scored(_) > 0),
      "positive-class docs score positive")
    assert((31L to 60L).forall(scored(_) < 0),
      "negative-class docs score negative")
    // plan shape: inference is a literal-array fold — no exchange at all
    val plan = LangModel.linearScore(docs, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"linearScore must be a narrow map stage:\n${plan.take(600)}")
  }

  test("rate weights: hand-computed ppm values, common scale across " +
      "classes") {
    // pos class: 4 tokens (a a b c), neg class: 2 tokens (a d)
    val docs = Seq((1L, "a a b c"), (2L, "a d")).toDF("doc_id", "text")
    val w = LangModel.trainRateWeights(docs, "text", $"doc_id" === 1L,
      buckets = 4096)
    val slotOf = (tk: String) => Seq(tk).toDF("t")
      .select(graft.ops.TextAnalysis.hash48($"t") % 4096).as[Long]
      .head().toInt
    // w(a) = 2e6/4 - 1e6/2 = 500000 - 500000 = 0 (equal rates cancel)
    assert(w(slotOf("a")) == 0L, "equal RATES cancel even with unequal " +
      "counts — the cross-class comparability property")
    // w(b) = 1e6/4 - 0 = 250000; w(d) = 0 - 1e6/2 = -500000
    assert(w(slotOf("b")) == 250000L)
    assert(w(slotOf("d")) == -500000L)
  }

  test("argmax router catches a marker-method miss: no marker tokens " +
      "(rule says 'und') but learned vocabulary routes correctly") {
    import graft.ops.TextAnalysis
    val de = (1L to 20L).map(i =>
      (i, s"der hund und die katze ist nicht da nummer$i"))
    val en = (21L to 40L).map(i =>
      (i, s"the dog and a cat is not here number$i"))
    val docs = (de ++ en).toDF("doc_id", "text")
    val labeled = docs.withColumn("m", TextAnalysis.langId($"text"))
    // sanity: the markers DO label the training slices
    assert(labeled.filter($"m" === "de").count() == 20L)
    assert(labeled.filter($"m" === "en").count() == 20L)
    val models = Seq("de", "en").map(c =>
      c -> LangModel.trainRateWeights(labeled, "text", $"m" === c,
        buckets = 4096))
    // marker-free German: every token is de-corpus vocabulary but none
    // is a function-word marker -> the rule method returns 'und'
    val probe = Seq((100L, "hund katze da nummer5")).toDF("doc_id", "text")
    assert(probe.select(TextAnalysis.langId($"text")).as[String].head()
      == "und", "precondition: the marker method misses this doc")
    val routed = LangModel.routeArgmax(probe, "doc_id", "text", models,
      out = "pred")
    assert(routed.select($"pred").as[String].head() == "de",
      "the learned router recognizes the non-marker vocabulary")
    assert(routed.select($"pred_score").as[Long].head() > 0L)
    // and the markered docs stay marker-consistent under the router
    val full = LangModel.routeArgmax(docs, "doc_id", "text", models,
      out = "pred")
    val agree = full.withColumn("m", TextAnalysis.langId($"text"))
      .filter($"pred" === $"m").count()
    assert(agree == 40L, "learned router agrees with the marker rule " +
      "on every markered training doc")
  }

  test("one-scan multi-class trainer ≡ per-class trainings, bit for bit") {
    import graft.ops.TextAnalysis
    val docs = ((1L to 10L).map(i => (i, s"der hund und die katze nr$i")) ++
      (11L to 20L).map(i => (i, s"the dog and a cat num$i")) ++
      (21L to 25L).map(i => (i, s"zzz qqq xxx $i"))).toDF("doc_id", "text")
    val labeled = docs.withColumn("m", TextAnalysis.langId($"text"))
    val classes = Seq("de", "en", "und")
    val multi = LangModel.trainRateWeightsMulti(labeled, "text", $"m",
      classes, buckets = 256)
    classes.foreach { c =>
      val single = LangModel.trainRateWeights(labeled, "text", $"m" === c,
        buckets = 256)
      assert(multi.toMap.apply(c).sameElements(single),
        s"class $c: the one-scan trainer must replay the per-class " +
          "arithmetic exactly")
    }
  }

  test("classifier weights are exact integers: balanced slot weights " +
      "cancel, class-skewed slots carry the sign") {
    // one shared token (both classes, balanced), one pos-only token
    val docs = Seq((1L, "shared good"), (2L, "shared bad"))
      .toDF("doc_id", "text")
    val w = LangModel.trainHashedClassifier(docs, "text",
      $"doc_id" === 1L, buckets = 64)
    val slotOf = (tk: String) => Seq(tk).toDF("t")
      .select(graft.ops.TextAnalysis.hash48($"t") % 64).as[Long].head().toInt
    assert(w(slotOf("shared")) == 0L,
      "a token equally frequent in both classes weighs zero (cp*Nn = cn*Np)")
    assert(w(slotOf("good")) > 0L && w(slotOf("bad")) < 0L)
  }
}
