package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo,
  IsNotNull}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

import graft.sources.GraftScanIntrospection

/**
 * DECLARED-CONSTRAINT catalog for the optimizer extensions: Spark has no
 * PRIMARY KEY / FOREIGN KEY DDL, so rewrites that are only valid under
 * referential integrity (join elimination, the classic one every
 * warehouse optimizer ships — Oracle, SQL Server, BigQuery all do this
 * against declared RI) need the constraints declared out of band.
 *
 * A declaration `declareRi(fk, pk)` asserts, by GLOBALLY UNIQUE COLUMN
 * NAME (the TPC-H convention — every column name carries its table
 * prefix), that
 *   1. `pk` is unique in its table,
 *   2. every non-null `fk` value has a matching `pk` row, and
 *   3. `fk` is NOT NULL.
 * Under 1–3 an inner equi-join fk = pk preserves left multiplicity
 * exactly — the join can vanish when nothing above reads the right side.
 * Declaring a constraint the data violates yields wrong results, same
 * as every RELY constraint system; the gate (q200) and spec re-verify
 * the declared pairs against the data.
 *
 * TABLE BINDING (round-9 advice): the column-name convention is the
 * safety linchpin of a result-changing rewrite, so a declaration may
 * additionally bind the pk to a TABLE TAG — the scanned table's
 * identity (file path / layout root / catalog name), compared EXACTLY
 * per identity component after path normalization, never by substring
 * (round-10 advice: `/data/dim` must not bind `/data/dim_backup`).
 * When a binding exists, the rule eliminates the join only if the dim
 * leaf's identity carries the tag; a LocalRelation (no identity) is
 * then never eligible. Unbound declarations keep the documented
 * convention.
 */
object ConstraintCatalog {
  private val riPairs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
  private val uniqueCols =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val pkTables =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Declare fk→pk referential integrity + fk NOT NULL + pk UNIQUE,
    * optionally binding the pk to its table (identity substring). */
  def declareRi(fkCol: String, pkCol: String,
                pkTableTag: String = null): Unit = {
    riPairs.add((fkCol.toLowerCase, pkCol.toLowerCase))
    declareUnique(pkCol, pkTableTag)
  }

  /** Declare a column UNIQUE in its table — the weaker constraint:
    * enough to eliminate a LEFT OUTER join against it (each left row
    * matches at most once, unmatched rows null-pad — either way exactly
    * one output row per left row, no RI or non-null assumption). */
  def declareUnique(pkCol: String, pkTableTag: String = null): Unit = {
    uniqueCols.add(pkCol.toLowerCase)
    if (pkTableTag != null) pkTables.put(pkCol.toLowerCase, pkTableTag)
  }

  def hasRi(fkCol: String, pkCol: String): Boolean =
    riPairs.contains((fkCol.toLowerCase, pkCol.toLowerCase))

  def isUnique(pkCol: String): Boolean =
    uniqueCols.contains(pkCol.toLowerCase)

  /** The table tag the pk is bound to, if any. */
  def tableBinding(pkCol: String): Option[String] =
    Option(pkTables.get(pkCol.toLowerCase))

  /** Test hook. */
  private[graft] def clear(): Unit = {
    riPairs.clear(); uniqueCols.clear(); pkTables.clear()
  }
}

/**
 * PK-FK inner-join ELIMINATION — a custom Catalyst `Rule[LogicalPlan]`
 * (installed via `spark.experimental.extraOptimizations`, the
 * user-provided-optimizers batch): an inner equi-join against a BARE
 * dimension scan is removed entirely when
 *
 *   - the join key pair is declared RI in [[ConstraintCatalog]]
 *     (pk unique, fk non-null and referentially intact),
 *   - the dimension side is a pure column-pruned scan — a chain of
 *     attribute-only Projects over a v1 relation or local relation,
 *     NO Filter anywhere (a filtered dim changes multiplicity),
 *   - the operator above the join references ONLY fact-side columns.
 *
 * Why it matters at 100 TB: the eliminated join is a broadcast probe per
 * row AT BEST and a shuffle of the fact table at worst — dropping it is
 * strictly cheaper than any join strategy. BI tools generate exactly
 * this shape constantly (star-schema views join every dimension; most
 * dashboards read measures only).
 *
 * Reference scope: the reference engine delegates all planning to
 * Postgres (/root/reference/trends.go:279-406 ships raw SQL) — this rule
 * is part of the optimizer surface the Spark engine adds.
 */
object PkFkJoinElimination extends Rule[LogicalPlan] {

  /** The dim side must be attribute-only Projects over a leaf scan.
    * One Filter shape is admitted: `IsNotNull(pk)` conjunctions that
    * the optimizer itself derives from the inner-join condition — a
    * null pk can never match an inner join, so dropping those rows
    * never changes which fact rows survive. Any OTHER dim filter
    * changes multiplicity and vetoes the rewrite.
    *
    * Eligible leaves:
    *  - v1 `LogicalRelation` / `LocalRelation` (column pruning only);
    *  - a DSv2 scan that exposes [[GraftScanIntrospection]] AND pushed
    *    NO filters (this rule runs in the user-provided batch, after
    *    V2ScanRelationPushDown — the planned Scan's pushed-filter list
    *    is readable, and an empty list plus the admitted-IsNotNull-only
    *    Filter shape above proves the scan returns every dim row).
    *    Opaque v2 scans stay ineligible: their pushdown is invisible.
    *
    * When the pk carries a TABLE BINDING, one of the leaf's identity
    * components (file paths / layout root / catalog name) must EQUAL
    * the bound tag after path normalization — a same-named column on a
    * different table, or one whose path merely extends the tag, never
    * qualifies. */
  private def bareScan(plan: LogicalPlan, pk: Attribute): Boolean =
    plan match {
      case Project(projectList, child) =>
        projectList.forall(_.isInstanceOf[Attribute]) &&
          bareScan(child, pk)
      case Filter(cond, child) =>
        splitConjunctivePredicates(cond).forall {
          case IsNotNull(a: Attribute) => a.semanticEquals(pk)
          case _ => false
        } && bareScan(child, pk)
      case lr: LogicalRelation => boundTo(pk, leafIdent(lr))
      case _: LocalRelation =>
        // no identity to verify — eligible only for UNBOUND declarations
        ConstraintCatalog.tableBinding(pk.name).isEmpty
      case r: DataSourceV2ScanRelation => r.scan match {
        case g: GraftScanIntrospection =>
          g.pushedPruningFilters.isEmpty &&
            boundTo(pk, Seq(g.tableIdent))
        case _ => false
      }
      case _ => false
    }

  /** Leaf identity honors the pk's table binding (absent binding ⇒
    * the documented globally-unique-column-name convention). The bound
    * tag must equal one identity COMPONENT exactly after path
    * normalization — never substring containment, which would let a
    * tag that is a path prefix of another table (`/data/dim` vs
    * `/data/dim_backup`) mis-bind and eliminate a join against the
    * wrong table (round-10 advice). */
  private def boundTo(pk: Attribute, ident: => Seq[String]): Boolean =
    ConstraintCatalog.tableBinding(pk.name) match {
      case None => true
      case Some(tag) =>
        val t = normIdent(tag)
        ident.exists(normIdent(_) == t)
    }

  /** Strip a URI scheme (`file:`, `hdfs://…` host-less forms Spark
    * emits for rootPaths) and any trailing slash so a declared local
    * path compares equal to the scan's qualified form of it. */
  private def normIdent(p: String): String = {
    val noScheme = p.replaceFirst("^[A-Za-z][A-Za-z0-9+.\\-]*:(//)?", "/")
      .replaceFirst("^/+", "/")
    if (noScheme.length > 1) noScheme.reverse.dropWhile(_ == '/').reverse
    else noScheme
  }

  private def leafIdent(lr: LogicalRelation): Seq[String] = {
    val rel = lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
      case other => Seq(other.toString)
    }
    rel ++ lr.catalogTable.map(_.identifier.unquotedString).toSeq
  }

  private def splitConjunctivePredicates(
      cond: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    cond match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  /** If `j` is an eliminable PK-FK join, the surviving fact side.
    *
    *  - INNER: needs full RI (pk unique + fk non-null + every fk has a
    *    pk row) — only then is multiplicity exactly preserved. Either
    *    side may be the dim.
    *  - LEFT OUTER: needs only pk UNIQUE on the RIGHT side — each left
    *    row yields exactly one output row whether it matches (unique ⇒
    *    at most one) or not (null-padded). No RI, no non-null fk.
    */
  private def survivor(j: Join): Option[LogicalPlan] = j match {
    case Join(left, right, Inner, Some(EqualTo(a: Attribute, b: Attribute)),
        _) =>
      val lOut = left.outputSet
      val rOut = right.outputSet
      val fkPk: Option[(Attribute, Attribute, LogicalPlan, LogicalPlan)] =
        if (lOut.contains(a) && rOut.contains(b)) Some((a, b, left, right))
        else if (lOut.contains(b) && rOut.contains(a))
          Some((b, a, left, right))
        else if (rOut.contains(a) && lOut.contains(b))
          Some((a, b, right, left))
        else if (rOut.contains(b) && lOut.contains(a))
          Some((b, a, right, left))
        else None
      fkPk.collect {
        case (fk, pk, fact, dim)
            if ConstraintCatalog.hasRi(fk.name, pk.name) &&
              bareScan(dim, pk) => fact
      }
    case Join(left, right, LeftOuter,
        Some(EqualTo(a: Attribute, b: Attribute)), _) =>
      val rOut = right.outputSet
      val pk = if (rOut.contains(a) && left.outputSet.contains(b)) Some(a)
        else if (rOut.contains(b) && left.outputSet.contains(a)) Some(b)
        else None
      pk.collect {
        case p if ConstraintCatalog.isUnique(p.name) &&
            bareScan(right, p) => left
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, j: Join) =>
      survivor(j) match {
        case Some(fact) if p.references.subsetOf(fact.outputSet) =>
          Project(projList, fact)
        case _ => p
      }
    case agg @ Aggregate(_, _, j: Join, _) =>
      survivor(j) match {
        case Some(fact) if agg.references.subsetOf(fact.outputSet) =>
          agg.copy(child = fact)
        case _ => agg
      }
  }

  /** Idempotently install the rule into the session's experimental
    * optimizations (the user-provided batch runs after the standard
    * optimizer, when pruning has already bared the dim scan). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.experimental.synchronized {
      if (!spark.experimental.extraOptimizations.contains(this))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ this
    }
}
