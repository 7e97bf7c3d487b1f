package graft.config

/** NATS-style subject filter algebra (reference:
  * internal/config/config.go:178-234): token sanitization, the DLQ subject
  * shape, and the filter-covers-pattern decision used to validate that
  * quarantined records cannot be published outside the stream's subject
  * space. Pure logic — property-tested in ConfigSpec.
  *
  * Filter grammar per token: a literal matches itself, `*` matches exactly
  * one token, a trailing `>` matches one-or-more remaining tokens.
  * "Covers" is filter-vs-PATTERN (the pattern may itself contain
  * wildcards): a filter covers a pattern iff every subject the pattern can
  * match is also matched by the filter.
  */
object Subjects {

  /** Replace NATS-reserved chars in one token; empty -> "_"
    * (config.go:199-205).
    */
  def subjectToken(s: String): String = {
    val t = s.trim
    if (t.isEmpty) "_"
    else t.replace(" ", "_").replace("*", "_").replace(">", "_")
  }

  /** The subject shape DLQ records are published under:
    * `{prefix}.{database}.*.*` — prefix/database sanitized, schema+table
    * variable (config.go:188-190; Transform.dlqSubject emits instances of
    * this shape).
    */
  def dlqSubjectPattern(prefix: String, database: String): String =
    Seq(subjectToken(prefix), subjectToken(database), "*", "*").mkString(".")

  /** Empty filter list means the default `cdc.>` (config.go:192-197). */
  def effectiveStreamSubjects(subjects: Seq[String]): Seq[String] =
    if (subjects.isEmpty) Seq("cdc.>") else subjects

  /** Does any stream filter cover the DLQ pattern? (config.go:178-186) */
  def dlqSubjectCovered(prefix: String, database: String,
      streamSubjects: Seq[String]): Boolean = {
    val pattern = dlqSubjectPattern(prefix, database)
    effectiveStreamSubjects(streamSubjects).exists(covers(_, pattern))
  }

  /** filter covers pattern (config.go:207-234). */
  def covers(filter: String, pattern: String): Boolean =
    tokensCover(filter.split("\\.", -1).toList, pattern.split("\\.", -1).toList)

  /** Token-wise co-recursion (config.go:211-234):
    *  - filter `>` (must be last) covers any NON-EMPTY remainder — NATS
    *    `>` matches one-or-more tokens. (Deviation from the reference,
    *    which returns true on an empty remainder too: `a.>` does not match
    *    subject `a`, so claiming it covers pattern `a` is unsound. The
    *    exhaustive soundness test in ConfigSpec checks this corner; it is
    *    unreachable from Validate, whose DLQ pattern always ends `*.*`.)
    *  - pattern `>` is only covered by filter `>`;
    *  - pattern `*` needs filter `*` (a literal filter token matches one
    *    subject, not every subject the `*` admits);
    *  - literal pattern token needs `*` or the same literal.
    */
  private def tokensCover(filter: List[String], pattern: List[String]): Boolean =
    (filter, pattern) match {
      case (Nil, p) => p.isEmpty
      case (">" :: rest, p) => rest.isEmpty && p.nonEmpty
      case (_, Nil) => false
      case (f :: fRest, ">" :: _) => f == ">" && fRest.isEmpty
      case (f :: fRest, "*" :: pRest) => f == "*" && tokensCover(fRest, pRest)
      case (f :: fRest, p :: pRest) =>
        (f == "*" || f == p) && tokensCover(fRest, pRest)
    }
}
