package graft.sources.colf

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Logical↔physical column-name mapping (RENAME COLUMN support).
  *
  * A rename is metadata-only: the stored (physical) column name is
  * frozen when a column is first declared ([[ColfVersions.TableMeta]]),
  * and only the LOGICAL name Spark sees changes. This object is the
  * single translation boundary: every name entering the connector from
  * Spark (required schemas, pushed/runtime filters, aggregation
  * references, write schemas, partition columns) is translated
  * logical→physical at the edge, the entire internal machinery —
  * pruning, absorption, headers, manifests, file encode/decode,
  * partition directories — operates purely on PHYSICAL names exactly as
  * before, and the few surfaces Spark reads back (`readSchema`,
  * `filterAttributes`) translate physical→logical.
  *
  * The identity mapping (`empty` — every table without renames) is a
  * guaranteed no-op fast path: all methods return their argument
  * unchanged without rebuilding anything.
  */
final case class ColfNames(toPhys: Map[String, String]) extends Serializable {

  val isIdentity: Boolean = toPhys.isEmpty
  private val toLog: Map[String, String] = toPhys.map(_.swap)

  def phys(n: String): String = if (isIdentity) n else toPhys.getOrElse(n, n)
  def log(n: String): String = if (isIdentity) n else toLog.getOrElse(n, n)

  def physSchema(st: StructType): StructType =
    if (isIdentity) st
    else StructType(st.fields.map(f => f.copy(name = phys(f.name))))

  def logSchema(st: StructType): StructType =
    if (isIdentity) st
    else StructType(st.fields.map(f => f.copy(name = log(f.name))))

  /** Rewrite a pushed/runtime filter to physical attribute names.
    * `None` = the filter has a shape this rewriter doesn't know; callers
    * must then EXCLUDE it from physical-side evaluation (pruning,
    * absorption, overwrite scoping) — never guess. On the identity
    * mapping every filter passes through unchanged (`Some(f)`).
    */
  def physFilter(f: Filter): Option[Filter] = {
    if (isIdentity) return Some(f)
    f match {
      case EqualTo(a, v)            => Some(EqualTo(phys(a), v))
      case EqualNullSafe(a, v)      => Some(EqualNullSafe(phys(a), v))
      case GreaterThan(a, v)        => Some(GreaterThan(phys(a), v))
      case GreaterThanOrEqual(a, v) => Some(GreaterThanOrEqual(phys(a), v))
      case LessThan(a, v)           => Some(LessThan(phys(a), v))
      case LessThanOrEqual(a, v)    => Some(LessThanOrEqual(phys(a), v))
      case In(a, vs)                => Some(In(phys(a), vs))
      case IsNull(a)                => Some(IsNull(phys(a)))
      case IsNotNull(a)             => Some(IsNotNull(phys(a)))
      case StringStartsWith(a, v)   => Some(StringStartsWith(phys(a), v))
      case StringEndsWith(a, v)     => Some(StringEndsWith(phys(a), v))
      case StringContains(a, v)     => Some(StringContains(phys(a), v))
      case And(l, r) =>
        for (pl <- physFilter(l); pr <- physFilter(r)) yield And(pl, pr)
      case Or(l, r) =>
        for (pl <- physFilter(l); pr <- physFilter(r)) yield Or(pl, pr)
      case Not(c)          => physFilter(c).map(Not)
      case _: AlwaysTrue   => Some(f)
      case _: AlwaysFalse  => Some(f)
      case other =>
        // unknown shape: translatable only if it touches no renamed name
        if (other.references.forall(r => !toPhys.contains(r) && !toLog.contains(r)))
          Some(other)
        else None
    }
  }
}

object ColfNames {
  val Identity: ColfNames = ColfNames(Map.empty)

  def of(meta: Option[ColfVersions.TableMeta]): ColfNames =
    meta.map(m => ColfNames(m.physical)).getOrElse(Identity)
}
