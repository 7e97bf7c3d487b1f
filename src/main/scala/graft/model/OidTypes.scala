package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.PgOutput.RelationInfo

/** PostgreSQL type OID -> Catalyst type mapping (the Spark analog of the
  * reference's pgtype-based OID decode, internal/parser/pgoutput.go:622-642;
  * SURVEY.md §1.2). Unknown OIDs degrade to StringType, exactly like the
  * reference degrades unknown OIDs to string (pgoutput.go:630, 636-638).
  *
  * OID constants are the stable built-in ids from the public PostgreSQL
  * catalog (pg_type.dat).
  */
object OidTypes {

  val Bool = 16; val Bytea = 17; val Int8 = 20; val Int2 = 21; val Int4 = 23
  val Text = 25; val Json = 114; val Float4 = 700; val Float8 = 701
  val Varchar = 1043; val Date = 1082; val TimestampOid = 1114
  val Timestamptz = 1184; val Numeric = 1700; val Uuid = 2950; val Jsonb = 3802

  def toCatalyst(oid: Int): DataType = oid match {
    case Bool => BooleanType
    case Bytea => BinaryType
    case Int2 => ShortType
    case Int4 => IntegerType
    case Int8 => LongType
    case Float4 => FloatType
    case Float8 => DoubleType
    case Numeric => DecimalType(38, 18)
    case Date => DateType
    case TimestampOid | Timestamptz => TimestampType
    case Text | Varchar | Json | Jsonb | Uuid => StringType
    case _ => StringType // unknown OID: degrade to string (pgoutput.go:636-638)
  }

  /** Catalyst schema of a relation from its registry entry. */
  def schemaFor(rel: RelationInfo): StructType =
    StructType(rel.columns.zip(rel.columnTypes).map { case (n, oid) =>
      StructField(n, toCatalyst(oid), nullable = true)
    })

  /** Project a string->string payload map into typed columns for one
    * relation — the "typed StructType at the table boundary" option of
    * SURVEY.md §1.2. Absent keys (unchanged TOAST) become null here; keep
    * the map column alongside if absence must stay observable.
    */
  def typedColumns(payload: Column, rel: RelationInfo): Seq[Column] =
    rel.columns.zip(rel.columnTypes).toSeq.map { case (n, oid) =>
      element_at(payload, n).cast(toCatalyst(oid)).as(n)
    }
}
