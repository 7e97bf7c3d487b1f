package graft

import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.config.{GraftConfig, Subjects}

/** Config load/validate parity with the reference's table tests
  * (internal/config/load_test.go) plus generator-driven properties for the
  * subject-filter cover algorithm (config.go:207-234). ScalaCheck Gens are
  * driven directly (deterministic seed) — the scalatestplus bridge isn't
  * in the offline dependency set.
  */
class ConfigSpec extends AnyFunSuite {

  private def forAllN[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  // ------------------------------------------------------------- load

  test("defaults survive an empty env; env overrides parse typed") {
    val d = GraftConfig.load(Map.empty).toOption.get
    assert(d == GraftConfig())
    val c = GraftConfig.load(Map(
      "BATCH_SIZE" -> "1000", "BATCH_TIMEOUT" -> "250ms",
      "UNSAFE_UNORDERED_ASYNC_PUBLISH" -> "yes",
      "STREAM_MAX_AGE" -> "1h30m", "TABLE_FILTERS" -> " a.b , c.d ,",
      "STREAM_STORAGE" -> "MEMORY")).toOption.get
    assert(c.batchSize == 1000 && c.batchTimeout == 250.millis)
    assert(c.unsafeUnorderedAsyncPublish)
    assert(c.streamMaxAge == 90.minutes)
    assert(c.tableFilters == Seq("a.b", "c.d"))
    assert(c.streamStorage == "memory")
  }

  test("parse errors are reported with the variable name") {
    assert(GraftConfig.load(Map("BATCH_SIZE" -> "abc")).left.exists(_.contains("BATCH_SIZE")))
    assert(GraftConfig.load(Map("DEBUG" -> "maybe")).left.exists(_.contains("DEBUG")))
    assert(GraftConfig.load(Map("BATCH_TIMEOUT" -> "fast")).left.exists(_.contains("BATCH_TIMEOUT")))
  }

  test("database name: explicit > AWS var > URL path > default (load.go:25-31)") {
    def db(env: Map[String, String]) = GraftConfig.load(env).toOption.get.database
    assert(db(Map("CDC_DATABASE_NAME" -> "x", "AWS_RDS_DATABASE" -> "y")) == "x")
    assert(db(Map("AWS_RDS_DATABASE" -> "y")) == "y")
    assert(db(Map("DATABASE_URL" -> "postgres://u:p@h:5432/mydb")) == "mydb")
    assert(db(Map.empty) == "postgres")
  }

  // --------------------------------------------------------- validate

  test("default config validates") {
    assert(GraftConfig().validate.isEmpty)
  }

  test("validation rejects out-of-range values (config.go:107-166)") {
    assert(GraftConfig(plugin = "decoderbufs").validate.exists(_.contains("CDC_PLUGIN")))
    assert(GraftConfig(batchSize = -1).validate.exists(_.contains("BATCH_SIZE")))
    assert(GraftConfig(batchTimeout = Duration.Zero).validate.exists(_.contains("BATCH_TIMEOUT")))
    assert(GraftConfig(publishAsyncMaxPending = -1).validate.isDefined)
    assert(GraftConfig(streamStorage = "disk").validate.exists(_.contains("STREAM_STORAGE")))
    assert(GraftConfig(streamReplicas = 0).validate.exists(_.contains("STREAM_REPLICAS")))
    assert(GraftConfig(publishFailurePolicy = "retry").validate.exists(_.contains("PUBLISH_FAILURE_POLICY")))
    assert(GraftConfig(publishFailurePolicy = "dlq", dlqSubjectPrefix = " ").validate
      .exists(_.contains("DLQ_SUBJECT_PREFIX")))
  }

  test("effectivePublishAsyncMaxPending: explicit > batchSize > 256 floor") {
    assert(GraftConfig(publishAsyncMaxPending = 7).effectivePublishAsyncMaxPending == 7)
    assert(GraftConfig(batchSize = 500).effectivePublishAsyncMaxPending == 500)
    assert(GraftConfig(batchSize = 10).effectivePublishAsyncMaxPending == 256)
  }

  test("accepts DLQ subject covered by stream subjects (load_test.go:180-200)") {
    for (subjects <- Seq(
        Seq("cdc.dlq.postgres.>"), Seq("cdc.dlq.postgres.*.*"),
        Seq("cdc.>"), Seq("cdc.*.postgres.*.*"))) {
      assert(GraftConfig(streamSubjects = subjects).validate.isEmpty,
        s"expected $subjects to cover the default DLQ pattern")
    }
  }

  test("rejects DLQ subject outside stream subjects (load_test.go:202-224)") {
    for ((subjects, prefix) <- Seq(
        (Seq("cdc.postgres.>"), "cdc.dlq"),
        (Seq("cdc.>"), "dead.cdc"),
        (Seq("cdc.dlq.postgres.public.*"), "cdc.dlq"))) {
      assert(GraftConfig(streamSubjects = subjects, dlqSubjectPrefix = prefix)
        .validate.exists(_.contains("not covered")), s"$subjects vs $prefix")
    }
  }

  test("crash policy does not require DLQ coverage (load_test.go:225-233)") {
    assert(GraftConfig(publishFailurePolicy = "crash",
      streamSubjects = Seq("cdc.postgres.>"), dlqSubjectPrefix = "dead.cdc")
      .validate.isEmpty)
  }

  // ------------------------------------------- cover algorithm properties

  private val token: Gen[String] =
    Gen.oneOf(Gen.choose('a', 'z').map(_.toString),
      Gen.oneOf("cdc", "dlq", "postgres", "public", "users"))
  private val subject: Gen[List[String]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, token))

  test("property: a filter covers the literal pattern identical to itself") {
    forAllN(subject) { s =>
      assert(Subjects.covers(s.mkString("."), s.mkString(".")))
    }
  }

  test("property: '>' covers every non-empty subject") {
    forAllN(subject) { s => assert(Subjects.covers(">", s.mkString("."))) }
  }

  test("property: 'prefix.>' covers any extension of prefix, nothing shorter") {
    forAllN(Gen.zip(subject, subject)) { case (p, ext) =>
      val filter = (p :+ ">").mkString(".")
      assert(Subjects.covers(filter, (p ++ ext).mkString(".")))
      assert(!Subjects.covers(filter, p.mkString(".")))
    }
  }

  test("property: '*' covers any literal at that position; a literal never covers '*'") {
    forAllN(Gen.zip(subject, token)) { case (s, a) =>
      val i = s.length / 2
      assert(Subjects.covers(s.updated(i, "*").mkString("."), s.updated(i, a).mkString(".")))
      assert(!Subjects.covers(s.updated(i, a).mkString("."), s.updated(i, "*").mkString(".")))
    }
  }

  test("covers is sound vs brute-force subject-set inclusion (exhaustive, short)") {
    // ground truth: NATS matching over every subject of length <= 4 on a
    // 2-letter alphabet. covers(f, p) claiming true must imply every
    // subject matched by p is matched by f (soundness is what validation
    // relies on: a "covered" DLQ pattern must never publish outside the
    // stream). Exhaustive over all filters/patterns of <= 3 tokens + '>'.
    val alphabet = List("a", "b")
    val subjects: Seq[List[String]] =
      (1 to 4).flatMap(n => cartesian(List.fill(n)(alphabet)))
    def matches(filter: List[String], subj: List[String]): Boolean =
      (filter, subj) match {
        case (Nil, s) => s.isEmpty
        case (">" :: rest, s) => rest.isEmpty && s.nonEmpty
        case (_, Nil) => false
        case (f :: fr, t :: tr) => (f == "*" || f == t) && matches(fr, tr)
      }
    val tokenSpace = List("a", "b", "*")
    val filters: Seq[List[String]] =
      (1 to 3).flatMap(n => cartesian(List.fill(n)(tokenSpace))) ++
        (0 to 2).flatMap(n => cartesian(List.fill(n)(tokenSpace)).map(_ :+ ">"))
    for (f <- filters; p <- filters) {
      val got = Subjects.covers(f.mkString("."), p.mkString("."))
      if (got) {
        val pSet = subjects.filter(matches(p, _))
        assert(pSet.forall(matches(f, _)),
          s"covers(${f.mkString(".")}, ${p.mkString(".")}) claimed but refuted")
      }
    }
  }

  private def cartesian[A](lists: List[List[A]]): List[List[A]] =
    lists.foldRight(List(List.empty[A])) { (opts, acc) =>
      opts.flatMap(o => acc.map(o :: _))
    }

  test("sanitization: reserved chars replaced, empty becomes underscore") {
    assert(Subjects.subjectToken("a b*c>d") == "a_b_c_d")
    assert(Subjects.subjectToken("  ") == "_")
    assert(Subjects.dlqSubjectPattern("cdc.dlq", "postgres") == "cdc.dlq.postgres.*.*")
  }
}
