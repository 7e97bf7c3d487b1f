package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextAnalysis => TA}

/** Text-analysis operator semantics that the oracle gates can't pin as
  * sharply: main-content block scoring and PII redaction shapes.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String, minLen: Int = 20): String =
    Seq(html).toDF("h")
      .select(TA.extractMainContent($"h", minLen).as("m"))
      .as[String].head()

  private val page =
    """<html><head><title>Site Title</title><style>p{color:red}</style>
      |<script>var x = 1 < 2;</script></head><body>
      |<div class="nav"><a href="/">Home</a> | <a href="/a">About</a> |
      | <a href="/c">Contact</a></div>
      |<h1>Post</h1>
      |<p>The quick brown fox jumps over the lazy dog in the main body.</p>
      |<p>Read the full <a href="/r">annual report</a> for more details
      | on the quarter.</p>
      |<aside><ul><li><a href="/1">Latest breaking news</a></li>
      |<li><a href="/2">Top trending stories</a></li></ul></aside>
      |<footer><a href="/p">Privacy Policy</a> |
      | <a href="/t">Terms of Service</a></footer>
      |</body></html>""".stripMargin

  test("extractMainContent keeps dense paragraphs, drops nav/aside/footer") {
    val got = extract(page)
    assert(got == "The quick brown fox jumps over the lazy dog in the " +
      "main body. Read the full annual report for more details on the " +
      "quarter.", s"got: $got")
  }

  test("extractMainContent: the head (title included) never leaks") {
    assert(!extract(page).contains("Site Title"))
  }

  test("htmlToText (tag stripping) KEEPS the boilerplate that " +
      "extractMainContent removes — the reason the upgrade exists") {
    val flat = Seq(page).toDF("h").select(TA.htmlToText($"h").as("t"))
      .as[String].head()
    assert(flat.contains("Privacy Policy") && flat.contains("Home"))
    val main = extract(page)
    assert(!main.contains("Privacy Policy") && !main.contains("Home |"))
  }

  test("link density: a mostly-anchor block drops even when long; a " +
      "paragraph that merely CONTAINS a link survives") {
    val linky = "<p><a href='/x'>This entire twenty-five-plus character " +
      "block is one big link</a></p>"
    assert(extract(linky) == "")
    val mixed = "<p>Plenty of surrounding prose keeps this " +
      "<a href='/x'>small link</a> block in the corpus.</p>"
    assert(extract(mixed) == "Plenty of surrounding prose keeps this " +
      "small link block in the corpus.")
  }

  test("short blocks drop; minLen is the knob") {
    val h = "<p>Tiny.</p><p>This sentence clears the twenty char bar.</p>"
    assert(extract(h) == "This sentence clears the twenty char bar.")
    assert(extract(h, minLen = 2) ==
      "Tiny. This sentence clears the twenty char bar.")
  }

  test("entities unescape inside kept blocks; <pre> is not <p>") {
    val h = "<pre>code &amp;&amp; more code stays verbatim here</pre>" +
      "<p>Fish &amp; chips &lt;3 are favored by the whole crew.</p>"
    val got = extract(h)
    assert(got.contains("Fish & chips <3"), s"got: $got")
    assert(got.contains("code && more code"), "pre splits as its own block")
  }

  // ------------------------------------------------------------ redact

  private def red(s: String): String =
    Seq(s).toDF("t").select(TA.redact($"t").as("r")).as[String].head()

  test("redact masks emails and long digit runs") {
    assert(red("mail bob.smith+tag@ex-ample.co.uk now") == "mail <EMAIL> now")
    assert(red("card 4111111111111111 here") == "card <NUM> here")
  }

  test("redact masks separator-tolerant phone shapes (the r11 gap: " +
      "555-123-4567 used to survive — no 7-digit contiguous run)") {
    assert(red("call 555-123-4567 now") == "call <PHONE> now")
    assert(red("call (555) 123-4567 now") == "call <PHONE> now")
    assert(red("call +1 555 987 6543 now") == "call <PHONE> now")
    assert(red("call 555.123.4567 now") == "call <PHONE> now")
  }

  test("redact masks IPv4, UUID, grouped card digits") {
    assert(red("from 192.168.0.1 today") == "from <IP> today")
    assert(red("sid 123e4567-e89b-12d3-a456-426614174000 ok") ==
      "sid <UUID> ok")
    assert(red("pay 4111-1111-1111-1111 thx") == "pay <CC> thx",
      "grouped card is <CC>, not a <PHONE> tail")
    assert(red("pay 4111 1111 1111 1111 thx") == "pay <CC> thx")
    assert(red("pay 5500-0000 0000-0004 thx") == "pay <CC> thx",
      "per-gap separators are independent — mixed '-'/' ' still one card")
    assert(red("amex 3782 822463 10005 ok") == "amex <CC> ok",
      "Amex 4-6-5 grouping is a card, not a phone/<NUM> shred")
    assert(red("amex 3782-822463-10005 ok") == "amex <CC> ok")
  }

  test("redact rule order: UUID hex never shreds to <NUM>; every shape " +
      "coexists in one string") {
    val got = red("u@example.com 123e4567-e89b-12d3-a456-426614174000 " +
      "4111-1111-1111-1111 (555) 123-4567 10.0.3.17 12345678901")
    assert(got == "<EMAIL> <UUID> <CC> <PHONE> <IP> <NUM>", s"got: $got")
  }

  test("redact leaves non-PII digits alone") {
    assert(red("in 2024 we saw 123 items (v1.2.3)") ==
      "in 2024 we saw 123 items (v1.2.3)",
      "years, short counts and versions survive")
  }
}
