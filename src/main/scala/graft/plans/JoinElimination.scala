package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** REFERENTIAL-INTEGRITY JOIN ELIMINATION — the classic warehouse
  * optimization Catalyst doesn't ship because Spark has no declared
  * constraints: an INNER join from a fact/child table to its
  * dimension/parent on a VALIDATED foreign key is row-preserving
  * (each child row matches exactly one parent row), so when a query
  * references no parent columns beyond the join key itself, the join
  * — its whole shuffle/broadcast stage and the parent scan — can be
  * dropped and the parent key replaced by the child key. At 100 TB
  * this removes an entire build side + probe pass from every
  * generated-BI query that joins to a dimension "just in case".
  *
  * Soundness needs exactly three facts, and [[FkRegistry
  * .validateAndRegister]] REFUSES the registration unless it can
  * prove all three on the live data (the q207 inclusion-dependency
  * discovery is the fleet-wide scan that nominates candidates):
  *   1. parent key is unique (PK): |parent| == |distinct parentCol|;
  *   2. child key is never NULL (an inner join would drop such rows);
  *   3. containment: no child value is missing from the parent
  *      (anti-join is empty).
  * Like MV registration (MvRewrite), validity over time is the
  * registrar's contract — register only while both tables are
  * immutable or maintained through the constraint.
  *
  * Matching contract (narrow on purpose — an elimination must never
  * be approximately right): the joined parent side must be the bare
  * registered parent scan (attribute-only Project over its
  * LogicalRelation — the shape column pruning leaves), the join an
  * INNER equi-join on exactly the declared key pair, the child side's
  * leaves must include the declared child scan, and the operator
  * above the join (Project or Aggregate) must reference no parent
  * attribute other than the parent key, which is substituted by the
  * child key (equal under the inner join) with original name/exprId
  * preserved so parents resolve unchanged. Types must match exactly.
  */
final case class FkDescriptor(
    childPath: String,
    childCol: String,
    parentPath: String,
    parentCol: String)

object FkRegistry {
  private val fks = scala.collection.concurrent.TrieMap[FkDescriptor, Unit]()
  def register(d: FkDescriptor): Unit = fks.put(d, ())
  def clear(): Unit = fks.clear()
  def all: Seq[FkDescriptor] = fks.keys.toSeq

  /** Prove PK uniqueness, FK non-nullness and containment on the live
    * frames, then register. Returns (nParent, nChild, nOrphans=0) for
    * audit; throws if any proof fails — a failed proof means the
    * "constraint" is not one and elimination would be WRONG.
    */
  def validateAndRegister(
      child: DataFrame, parent: DataFrame, d: FkDescriptor): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val Array(nParent, nParentKeys) = parent
      .agg(org.apache.spark.sql.functions.count(col(d.parentCol)),
        countDistinct(col(d.parentCol)))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    require(parent.count() == nParent && nParent == nParentKeys,
      s"${d.parentCol} is not a primary key (nulls or duplicates)")
    val nNullFk = child.filter(col(d.childCol).isNull).count()
    require(nNullFk == 0, s"${d.childCol} has $nNullFk NULLs — inner join is not row-preserving")
    val orphans = child.select(col(d.childCol))
      .join(parent, child(d.childCol) === parent(d.parentCol), "left_anti").count()
    require(orphans == 0, s"$orphans child rows have no parent — containment fails")
    register(d)
    (nParent, child.count())
  }
}

object JoinElimination {
  def ensureInjected(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[JoinEliminationRule.type]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ JoinEliminationRule
}

object JoinEliminationRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (FkRegistry.all.isEmpty) plan
    else plan.transformDown {
      case p @ Project(pl, j: Join) =>
        tryEliminate(j, pl.flatMap(_.references)) match {
          case Some((newChild, pk, ck)) => Project(pl.map(substitute(_, pk, ck)), newChild)
          case None => p
        }
      case a @ Aggregate(ge, ae, j: Join, hint) =>
        tryEliminate(j, (ge ++ ae).flatMap(_.references)) match {
          case Some((newChild, pk, ck)) =>
            Aggregate(ge.map(substituteExpr(_, pk, ck)),
              ae.map(substitute(_, pk, ck)), newChild, hint)
          case None => a
        }
    }
  }

  /** If the join is an eliminable FK join and `refs` touches no parent
    * column beyond the parent key, return (child side, parentKeyAttr,
    * childKeyAttr).
    */
  private def tryEliminate(
      j: Join,
      refs: Seq[Attribute]): Option[(LogicalPlan, Attribute, Attribute)] = {
    if (j.joinType != Inner) return None
    val cond = j.condition match {
      case Some(e @ EqualTo(_: AttributeReference, _: AttributeReference)) => e
      case _ => return None
    }
    FkRegistry.all.view.flatMap { d =>
      // RULE INTERACTION: a row policy registered on the parent table
      // makes the join row-FILTERING, not row-preserving — and rule
      // order in the fixed point could eliminate the join before the
      // policy's Filter ever appears, silently bypassing row-level
      // security (caught by JoinEliminationSpec's interaction test).
      // Elimination must consult the policy registry and back off.
      if (PolicyRegistry.all.exists(pol => d.parentPath.endsWith(pol.path) ||
          pol.path.endsWith(d.parentPath))) Nil
      else
      // orientations: (child side, parent side)
      Seq((j.left, j.right), (j.right, j.left)).flatMap { case (childSide, parentSide) =>
        for {
          _ <- parentScan(parentSide, d.parentPath, d.parentCol)
          (ck, pk) <- keyPair(cond, childSide, parentSide, d)
          // the child key attribute must TRACE to the registered child
          // scan through null-preserving, value-preserving operators —
          // a leaves-contain-the-scan check is not enough: the scan
          // could sit on the null-producing side of an outer join
          // (validated non-nullness doesn't survive), or a same-named
          // column from a DIFFERENT leaf could be the real join key;
          // either way the inner join filters rows and elimination
          // would be wrong
          if keyFromChildScan(childSide, ck, d.childPath)
          if ck.dataType == pk.dataType
          // every referenced parent attribute must BE the parent key
          parentOut = parentSide.outputSet
          if refs.forall(a => !parentOut.contains(a) || a.exprId == pk.exprId)
        } yield (childSide, pk, ck)
      }
    }.headOption
  }

  private def parentScan(p: LogicalPlan, path: String, keyCol: String): Option[Unit] = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      parentScan(child, path, keyCol)
    // constraint propagation infers IsNotNull(join key) on both sides;
    // on a validated PK it filters nothing, so it's safe to see
    // through — but ONLY on the key column. Any other parent-side
    // filter blocks the match: it could drop parent rows and the join
    // would stop being row-preserving.
    case org.apache.spark.sql.catalyst.plans.logical.Filter(IsNotNull(a: AttributeReference), child)
        if a.name.equalsIgnoreCase(keyCol) =>
      parentScan(child, path, keyCol)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation
        if fs.location.rootPaths.exists(_.toString.endsWith(path)) => Some(())
      case _ => None
    }
    case _ => None
  }

  /** Does `key`'s VALUE SET provably come from the registered child
    * scan at `path`, with the validated non-null/containment facts
    * intact? The walk follows the attribute down through operators
    * that only REMOVE rows or pass the attribute through unchanged
    * (Filter/Sort/Limit/Distinct/Repartition/alias projections/Window
    * pass-through, a grouping key of an Aggregate, the PRESERVED and
    * non-null-producing side of a join). Anything else — an outer
    * join's null-producing side, Expand, Union, a computed alias —
    * fails the match and blocks elimination (the rule's
    * never-approximately-right contract).
    */
  private def keyFromChildScan(p: LogicalPlan, key: Attribute, path: String): Boolean = {
    import org.apache.spark.sql.catalyst.plans._
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case lr: LogicalRelation =>
        lr.output.exists(_.exprId == key.exprId) && (lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toString.endsWith(path))
          case _ => false
        })
      case Project(pl, child) =>
        pl.find(_.exprId == key.exprId) match {
          case Some(a: AttributeReference) => keyFromChildScan(child, a, path)
          case Some(Alias(a: AttributeReference, _)) => keyFromChildScan(child, a, path)
          case _ => false
        }
      case Aggregate(ge, ae, child, _) =>
        // a grouping ATTRIBUTE's values are a subset of the child's
        ae.find(_.exprId == key.exprId) match {
          case Some(a: AttributeReference)
              if ge.exists { case g: AttributeReference => g.exprId == a.exprId; case _ => false } =>
            keyFromChildScan(child, a, path)
          case _ => false
        }
      case jn: Join =>
        val fromLeft = jn.left.outputSet.contains(key)
        val fromRight = jn.right.outputSet.contains(key)
        jn.joinType match {
          case Inner | Cross => (fromLeft && keyFromChildScan(jn.left, key, path)) ||
            (fromRight && keyFromChildScan(jn.right, key, path))
          case LeftOuter | LeftSemi | LeftAnti =>
            fromLeft && keyFromChildScan(jn.left, key, path)
          case RightOuter => fromRight && keyFromChildScan(jn.right, key, path)
          case _ => false // FullOuter / existence joins can null the key
        }
      case Filter(_, child) => keyFromChildScan(child, key, path)
      case Sort(_, _, child, _) => keyFromChildScan(child, key, path)
      case GlobalLimit(_, child) => keyFromChildScan(child, key, path)
      case LocalLimit(_, child) => keyFromChildScan(child, key, path)
      case SubqueryAlias(_, child) => keyFromChildScan(child, key, path)
      case Deduplicate(_, child) => keyFromChildScan(child, key, path)
      case r: RepartitionOperation => keyFromChildScan(r.child, key, path)
      case w: Window => // window only ADDS columns; pass-through attrs survive
        w.child.outputSet.contains(key) && keyFromChildScan(w.child, key, path)
      case _ => false
    }
  }

  private def keyPair(
      cond: EqualTo,
      childSide: LogicalPlan,
      parentSide: LogicalPlan,
      d: FkDescriptor): Option[(Attribute, Attribute)] = {
    val (l, r) = (cond.left.asInstanceOf[AttributeReference],
      cond.right.asInstanceOf[AttributeReference])
    def named(a: Attribute, n: String, side: LogicalPlan) =
      a.name.equalsIgnoreCase(n) && side.outputSet.contains(a)
    if (named(l, d.childCol, childSide) && named(r, d.parentCol, parentSide)) Some((l, r))
    else if (named(r, d.childCol, childSide) && named(l, d.parentCol, parentSide)) Some((r, l))
    else None
  }

  /** Replace references to the parent key with the child key; if the
    * named expression IS the bare parent key, alias the child key to
    * the original name/exprId so parent operators resolve unchanged.
    */
  private def substitute(ne: NamedExpression, pk: Attribute, ck: Attribute): NamedExpression =
    ne match {
      case a: AttributeReference if a.exprId == pk.exprId =>
        Alias(ck, a.name)(exprId = a.exprId)
      case other =>
        other.transform {
          case a: AttributeReference if a.exprId == pk.exprId => ck
        }.asInstanceOf[NamedExpression]
    }

  private def substituteExpr(e: Expression, pk: Attribute, ck: Attribute): Expression =
    e.transform { case a: AttributeReference if a.exprId == pk.exprId => ck }
}
