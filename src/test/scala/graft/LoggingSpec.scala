package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.logging.Log

/** The structured-logging surface (reference: internal/logging/logger.go —
  * zap production JSON config + debug toggle). The render is a pure
  * function; its JSON shape is the contract.
  */
class LoggingSpec extends AnyFunSuite {

  test("render: one JSON object, message first, fields in call order") {
    assert(Log.render("starting", Seq("slot" -> "s1", "batch" -> 500)) ==
      """{"message":"starting","slot":"s1","batch":500}""")
  }

  test("render: types — numbers/booleans bare, null/None null, seqs arrays") {
    assert(Log.render("m", Seq(
      "b" -> true, "n" -> 7L, "d" -> 1.5, "x" -> null, "o" -> None,
      "s" -> Some("v"), "xs" -> Seq("a", "b"), "ns" -> Seq(1, 2))) ==
      """{"message":"m","b":true,"n":7,"d":1.5,"x":null,"o":null,""" +
        """"s":"v","xs":["a","b"],"ns":[1,2]}""")
  }

  test("render: JSON escaping of quotes, backslashes, control chars") {
    val ctl = 1.toChar.toString // built at runtime: no control bytes in source
    assert(Log.render("he said \"hi\"", Seq("p" -> ("a\\b\n\tc" + ctl))) ==
      "{\"message\":\"he said \\\"hi\\\"\",\"p\":\"a\\\\b\\n\\tc\\" + "u0001\"}")
  }

  test("render parses as JSON (round-trip through a strict parser)") {
    // the line must be machine-ingestable — the reason the reference uses
    // zap's JSON encoding in production config
    val line = Log.render("msg \"x\"", Seq("k" -> "v\n", "n" -> 3))
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    import org.json4s.DefaultFormats
    implicit val fmts: org.json4s.Formats = DefaultFormats
    assert((parsed \ "message").extract[String] == "msg \"x\"")
    assert((parsed \ "k").extract[String] == "v\n")
    assert((parsed \ "n").extract[Int] == 3)
  }

  test("configure toggles the graft logger tree between INFO and DEBUG") {
    val logger = org.apache.logging.log4j.LogManager.getLogger("graft.logging.probe")
    Log.configure(debugMode = false)
    assert(!logger.isDebugEnabled, "production config: debug off")
    Log.configure(debugMode = true)
    assert(logger.isDebugEnabled, "debug config: debug on")
    Log.configure(debugMode = false)
    assert(!logger.isDebugEnabled)
  }
}
