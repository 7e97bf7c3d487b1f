package graft.logging

import org.apache.logging.log4j.{Level, LogManager, Logger}

/** Structured logging for the engine's own components (reference:
  * internal/logging/logger.go — a zap production-config JSON logger with a
  * debug toggle; cmd/cdc-handler/main.go:40-43,115-135 logs startup and
  * lifecycle events as typed fields).
  *
  * Spark already runs log4j2, so this does NOT bring a logging framework —
  * it is the zap-shaped surface on the stack that exists: each call renders
  * `message` plus typed fields as ONE deterministic JSON object line
  * (fields in call order, JSON-escaped), emitted through the ordinary
  * log4j2 logger so appender/level routing stays in the deployment's
  * log4j2 configuration where Spark operators expect it. `debugMode` is
  * the reference's `debug` flag: it raises the `graft` logger tree to
  * DEBUG at runtime (zap's development-config analog).
  *
  * Executor-side use is fine (LogManager is process-local); the render is
  * a pure function, pinned by LoggingSpec.
  */
object Log {

  /** JSON-escape a string value (quote, backslash, control chars). */
  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  /** One JSON object line: `{"message":…,fields…}`. Numbers and booleans
    * stay bare, null stays null, sequences render as arrays, everything
    * else is a quoted string — deterministic, field order = call order.
    */
  def render(message: String, fields: Seq[(String, Any)]): String = {
    def value(v: Any): String = v match {
      case null => "null"
      case None => "null"
      case Some(x) => value(x)
      case b: Boolean => b.toString
      case n: Byte => n.toString
      case n: Short => n.toString
      case n: Int => n.toString
      case n: Long => n.toString
      case n: Double if !n.isNaN && !n.isInfinite => n.toString
      case n: Float if !n.isNaN && !n.isInfinite => n.toString
      case xs: Seq[_] => xs.map(value).mkString("[", ",", "]")
      case other => s""""${esc(String.valueOf(other))}""""
    }
    (s""""message":"${esc(message)}"""" +:
      fields.map { case (k, v) => s""""${esc(k)}":${value(v)}""" })
      .mkString("{", ",", "}")
  }

  /** Raise the `graft` logger tree to DEBUG (the reference's debug
    * development config); INFO otherwise.
    */
  def configure(debugMode: Boolean): Unit =
    org.apache.logging.log4j.core.config.Configurator.setAllLevels(
      "graft", if (debugMode) Level.DEBUG else Level.INFO)

  def apply(cls: Class[_]): StructuredLogger =
    new StructuredLogger(LogManager.getLogger(cls))
  def apply(name: String): StructuredLogger =
    new StructuredLogger(LogManager.getLogger(name))
}

final class StructuredLogger(private val underlying: Logger) {
  def info(message: String, fields: (String, Any)*): Unit =
    underlying.info(Log.render(message, fields))
  def warn(message: String, fields: (String, Any)*): Unit =
    underlying.warn(Log.render(message, fields))
  def error(message: String, fields: (String, Any)*): Unit =
    underlying.error(Log.render(message, fields))
  def debug(message: String, fields: (String, Any)*): Unit =
    underlying.debug(Log.render(message, fields))
}
