package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `probe_cells(vec)` → `array<bigint>`: the `nProbe` nearest IVF cell ids
  * in (rounded cosine DESC, cell id ASC) order — [[NearestCell]]'s
  * multi-probe sibling, replacing the declarative
  * `slice(sort_array(array(struct(cosine(v, lit cᵢ))…)), 1, nProbe)` whose
  * expression tree is linear in the centroid count (the same JVM 64 KB
  * codegen hazard past ~1k cells; see NearestCell).
  *
  * The probe expression evaluates on the QUERY side only — typically a few
  * thousand rows against the corpus's millions — so unlike the assignment
  * kernel this one simply rounds every candidate sim (the full (sim desc,
  * id asc) order over rounded values is the contract, not just the argmax)
  * and keeps a small insertion-sorted top-`nProbe` prefix: O(|cells| ·
  * nProbe) per query row with nProbe ≤ 16, no allocation beyond the
  * result.
  *
  * Null vector / null element: every sim is null; the declarative
  * sort_array put the null-sim structs LAST in descending order... except
  * all candidates tie null, so ordering reduces to negCell desc = id asc —
  * the first `nProbe` ids. Mirrored here. NaN sims sort ABOVE numbers
  * (Spark double ordering), also mirrored.
  */
case class ProbeCells(child: Expression, cands: Array[(Long, Array[Double])],
    nProbe: Int) extends UnaryExpression {

  require(cands.nonEmpty, "probe_cells requires at least one centroid")
  require(nProbe >= 1, s"nProbe must be positive: $nProbe")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean  = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"probe_cells requires array<float|double>, got $other")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val table: NearestCell.Table =
    NearestCell.Table.build(cands)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    ProbeCells.probe(
      if (v == null) null else v.asInstanceOf[ArrayData], table, isFloat, nProbe)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("pcTable", table,
      "graft.functions.NearestCell$Table")
    val c = child.genCode(ctx)
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        ${c.code}
        ArrayData ${ev.value} = graft.functions.ProbeCells.probe(
          ${c.isNull} ? null : ${c.value}, $tableRef, $isFloat, $nProbe);
      """)
  }

  override def equals(other: Any): Boolean = other match {
    case ProbeCells(c, b, p) =>
      c == child && p == nProbe && b.length == cands.length &&
        b.zip(cands).forall { case ((i1, v1), (i2, v2)) =>
          i1 == i2 && java.util.Arrays.equals(v1, v2) }
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + nProbe) + cands.map { case (i, v) =>
      31 * i.hashCode() + java.util.Arrays.hashCode(v) }.toSeq.hashCode()

  override protected def withNewChildInternal(newChild: Expression): ProbeCells =
    copy(child = newChild)
}

object ProbeCells {

  private def roundHalfUp6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Spark's descending double order with NaN first: compare(a, b) > 0
    * when a ranks ABOVE b. java.lang.Double.compare already puts NaN above
    * every number; rounded sims never produce -0.0 (the one divergence).
    */
  private def ranksAbove(a: Double, b: Double): Boolean =
    java.lang.Double.compare(a, b) > 0

  def probe(v: ArrayData, t: NearestCell.Table, isFloat: Boolean,
      nProbe: Int): ArrayData = {
    val take = math.min(nProbe, t.nCells)
    if (v == null) return firstIds(t, take)
    val n = v.numElements()
    require(n == t.d, s"probe_cells: length mismatch $n vs ${t.d}")
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return firstIds(t, take)
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var nx = 0.0
    i = 0
    while (i < n) { nx += x(i) * x(i); i += 1 }
    val sqnx = math.sqrt(nx)
    val flat = t.flat
    // insertion-sorted top prefix by (rounded sim desc, id asc): ids are
    // scanned ascending, so on equal sims the incumbent (smaller id) wins
    val topSim = new Array[Double](take)
    val topId  = new Array[Long](take)
    var filled = 0
    var c = 0
    var base = 0
    while (c < t.nCells) {
      var dot = 0.0
      i = 0
      while (i < n) { dot += x(i) * flat(base + i); i += 1 }
      val sim = roundHalfUp6(dot / (sqnx * t.norms(c)))
      if (filled < take || ranksAbove(sim, topSim(filled - 1))) {
        var pos = math.min(filled, take - 1)
        while (pos > 0 && ranksAbove(sim, topSim(pos - 1))) {
          topSim(pos) = topSim(pos - 1); topId(pos) = topId(pos - 1); pos -= 1
        }
        topSim(pos) = sim; topId(pos) = t.ids(c)
        if (filled < take) filled += 1
      }
      c += 1
      base += n
    }
    new GenericArrayData(topId.take(filled))
  }

  private def firstIds(t: NearestCell.Table, take: Int): ArrayData =
    new GenericArrayData(t.ids.take(take))

  def probeCells(vec: Column, cands: Array[(Long, Array[Double])],
      nProbe: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      ProbeCells(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec), cands, nProbe))
}
