package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo, GenericInternalRow, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector expressions with full whole-stage-codegen support.
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`)
  * evaluate their lambdas *interpreted*, one element at a time, which
  * is the difference between a scoring stage that keeps up with the
  * scan and one that dominates the query (measured ~30× on the
  * shingling path). These expressions generate a primitive double
  * loop inside the WholeStageCodegen stage instead — the preferred
  * extension point before mapPartitions (SURVEY §3: custom Catalyst
  * Expression beats a Scala UDF beats everything else).
  *
  * Both fold strictly in index order, so results are bit-identical to
  * the interpreted `aggregate(zip_with(...))` they replace and to the
  * DuckDB oracle's ordered list_sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs are coerced to ARRAY<DOUBLE> at registration (register()
  // wraps children in Cast) — AbstractDataType/ImplicitCastInputTypes
  // are private[sql] in Spark 4.
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a double array — `sqrt(Σ x²)`, index order. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $x.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Count of common elements between two SORTED, de-duplicated long
  * arrays — a primitive merge scan in generated code. Replaces
  * `size(array_intersect(a, b))` on the dedup verification hot path,
  * which builds a hash set AND materializes the intersection array
  * per evaluation (and Catalyst inlines the shared subexpression into
  * the join condition twice); the merge scan does ~|a|+|b| long
  * compares with zero allocation.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_isect"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1L; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $x.getLong($i);
         |  long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Bloom-filter membership probe with whole-stage-codegen support:
  * `graft_might_contain(serialized_filter, key)`. The filter argument
  * must be foldable (a binary literal of
  * `org.apache.spark.util.sketch.BloomFilter.writeTo` bytes); it is
  * deserialized once per JVM and installed as a codegen reference
  * object, so the generated probe is a single virtual call inside the
  * scan's WholeStageCodegen stage — unlike a Scala UDF probe, which
  * forces a codegen break (ser/deser of every row) on the fact-side
  * scan. This build's SQL surface registers no builtin
  * `might_contain`, hence the custom expression (same extension point
  * as `graft_dot`).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  @transient private lazy val filter: org.apache.spark.util.sketch.BloomFilter = {
    require(left.foldable, "graft_might_contain: filter argument must be foldable")
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    filter.mightContainLong(b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloom", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, y) => s"${ev.value} = $bf.mightContainLong($y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid argmin against a PACKED centroid matrix:
  * `graft_argmin(matrix, cluster_ids, v, nrm)` returns
  * `STRUCT<d: DOUBLE, c: INT>` — the 6-dp-rounded squared L2 distance
  * to the nearest centroid and that centroid's cluster id, ties to
  * the lower id.
  *
  * This is the scale path of the Lloyd trainer's assignment
  * ([[graft.similarity.Cluster]]): the literal formulation builds k
  * struct expressions (one `graft_dot` against a per-centroid literal
  * array each), whose generated projection grows O(k·d) and falls out
  * of JIT/codegen limits around a few thousand centroids — fatal once
  * k tracks the corpus (k = n/2048 ⇒ k ≈ 500k at 1B vectors). Here
  * the whole matrix rides in as ONE foldable literal (shipped once
  * per stage inside the torrent-broadcast task binary, exactly like a
  * broadcast variable), is unpacked ONCE per executor JVM into
  * primitive `double[][]` (transient lazy), and the per-row work is a
  * single k×d primitive loop behind a constant-size generated call —
  * no codegen growth in k at all.
  *
  * Equivalence contract with the literal path (spec-pinned by
  * ClusterSpec "matrix path ≡ literal path"):
  *  - distance folds in the literal path's exact float op order:
  *    `(nrm·nrm − 2.0·dot) + c2`, dot and c2 accumulating in index
  *    order (= `graft_dot` and [[graft.similarity.Cluster]]'s
  *    driver-side fold);
  *  - rounding mirrors Spark's `round(_, 6)` on DOUBLE (NaN/Inf pass
  *    through, else `BigDecimal.valueOf(x).setScale(6, HALF_UP)`);
  *  - the argmin compares with Spark SQL's double ordering (NaN
  *    greatest, NaN = NaN, ±0 equal), ties to the lower cluster id —
  *    bit-for-bit what `array_min` over `struct(d, c)` yields.
  */
case class CentroidArgMin(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))
  override def prettyName: String = "graft_argmin"

  /** (centroid vectors, cluster ids, |c|² norms), id-ascending — built
    * once per JVM from the foldable matrix/ids children.
    */
  @transient private lazy val packed: (Array[Array[Double]], Array[Int], Array[Double]) = {
    require(first.foldable && second.foldable,
      "graft_argmin: centroid matrix and ids must be foldable")
    val m = first.eval(null).asInstanceOf[ArrayData]
    val idsRaw = second.eval(null).asInstanceOf[ArrayData].toIntArray()
    val k = m.numElements()
    require(k > 0 && k == idsRaw.length,
      s"graft_argmin: need k > 0 centroids with aligned ids (got $k matrix rows, ${idsRaw.length} ids)")
    val pairs = Array.tabulate(k)(j => (idsRaw(j), m.getArray(j).toDoubleArray())).sortBy(_._1)
    val cents = pairs.map(_._2)
    val c2s = cents.map { cv =>
      var s = 0.0; var i = 0
      while (i < cv.length) { s += cv(i) * cv(i); i += 1 }
      s
    }
    (cents, pairs.map(_._1), c2s)
  }

  /** Spark's `round(x, 6)` on DOUBLE, exactly. */
  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark SQL double ordering `a < b`: NaN greatest, NaN = NaN, ±0
    * equal (SQLOrderingUtil.compareDoubles semantics).
    */
  private def less(a: Double, b: Double): Boolean =
    if (a < b) true
    else if (a > b || a == b) false
    else !java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b)

  /** Raw distances, reused across the two passes — thread-local (the
    * deserialized-per-task instance is thread-confined on executors,
    * but the interpreted eval path can run driver-side on shared
    * instances) so the hot loop is allocation-free.
    */
  @transient private lazy val scratch: ThreadLocal[Array[Double]] =
    new ThreadLocal[Array[Double]] {
      override def initialValue(): Array[Double] = new Array[Double](packed._1.length)
    }

  /** The per-row loop — shared verbatim by eval and generated code
    * (the codegen installs `this` as a reference object and calls it,
    * the BloomMightContain pattern: constant-size generated code, no
    * codegen break, JIT compiles the loop like any hot method).
    *
    * Two passes: (1) raw distances + raw min (pure flops); (2) the
    * exact contract — round THEN (d, c)-lexicographic argmin — but
    * only over candidates that can round-tie with the raw min.
    * Rounding is monotone, so the minimal rounded distance is
    * `round6(rawMin)` and any round-tie candidate sits within one
    * decimal bucket (1e-6) of the raw min; the cut adds a 10×
    * absolute + relative slop over that bound, so the candidate set
    * is a strict superset of the round-ties and the selection is
    * bit-identical to rounding all k — without k BigDecimal
    * constructions per row (measured ~100ns each: at k = 10⁴ that is
    * the difference between flop-bound and BigDecimal-bound).
    */
  def evalRow(vAny: Any, nrm: Double): InternalRow = {
    val v = vAny.asInstanceOf[ArrayData]
    val (cents, ids, c2s) = packed
    val k = cents.length
    val buf = scratch.get()
    var m = 0.0
    var j = 0
    while (j < k) {
      val cv = cents(j)
      val n = math.min(v.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * cv(i); i += 1 }
      val d2 = (nrm * nrm - 2.0 * dot) + c2s(j)
      buf(j) = d2
      if (j == 0 || less(d2, m)) m = d2
      j += 1
    }
    // NaN min means every distance is NaN (NaN never wins `less`
    // against a number): cut = NaN keeps everyone (x > NaN is false)
    val cut = m + 1e-5 + 1e-9 * math.abs(m)
    var bestD = 0.0
    var bestC = 0
    var first = true
    j = 0
    while (j < k) {
      if (!(buf(j) > cut)) {
        val d2 = round6(buf(j))
        if (first || less(d2, bestD)) { bestD = d2; bestC = ids(j); first = false }
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestC))
  }

  override def nullSafeEval(m: Any, c: Any, v: Any, n: Any): Any =
    evalRow(v, n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftArgMin", this, classOf[CentroidArgMin].getName)
    nullSafeCodeGen(ctx, ev, (_, _, v, n) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.evalRow($v, $n);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): CentroidArgMin =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

/** Nearest-centroid argmin against a PER-ROW candidate array:
  * `graft_argmin_cell(cs, v, nrm)` where `cs` is
  * `ARRAY<STRUCT<cluster: INT, cv: ARRAY<DOUBLE>, c2: DOUBLE>>` —
  * the hierarchical k-means serve's broadcast-joined cell column
  * ([[graft.similarity.Cluster]]). Returns `STRUCT<d: DOUBLE, c: INT>`
  * exactly like [[CentroidArgMin]].
  *
  * [[CentroidArgMin]] requires its matrix to be FOLDABLE (one packed
  * literal per stage) — right for trained-centroid assignment, useless
  * for the hierarchical serve where each row's candidate set is its
  * coarse cell's sub-centroids, delivered per row by a broadcast hash
  * join. The `array_min(transform(...))` formulation this replaces is
  * a higher-order function: Catalyst evaluates the lambda INTERPRETED
  * per element (and boxes a struct per candidate), dropping the whole
  * projection out of whole-stage codegen — measured 1.7× on warm
  * dedup_semantic at sf10 (the r20 BASELINE follow-up). Here the
  * per-row work is the same primitive two-pass loop as
  * [[CentroidArgMin.evalRow]], reading candidate vectors straight out
  * of the broadcast relation's ArrayData with zero boxing.
  *
  * Equivalence contract (spec-pinned bit-identical to the
  * `array_min(transform(...))` it replaces): distance =
  * `round6((nrm·nrm − 2.0·dot) + c2)` with dot folding in index order
  * (= `graft_dot`); argmin under Spark SQL double ordering; ties to
  * the LOWER cluster id — the candidates arrive cluster-sorted
  * (`array_sort(collect_list(struct(cluster, ...)))`), and a
  * cluster-descending round-tie is still resolved by id, not array
  * position, so sortedness is not load-bearing for correctness.
  */
case class CellArgMin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))
  override def prettyName: String = "graft_argmin_cell"

  /** Spark's `round(x, 6)` on DOUBLE, exactly. */
  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark SQL double ordering `a < b` (NaN greatest, NaN = NaN). */
  private def less(a: Double, b: Double): Boolean =
    if (a < b) true
    else if (a > b || a == b) false
    else !java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b)

  /** Per-row distance scratch, grown to the largest cell seen by this
    * thread (cells are √k-sized; the array is tiny either way).
    */
  @transient private lazy val scratch: ThreadLocal[Array[Double]] =
    new ThreadLocal[Array[Double]] {
      override def initialValue(): Array[Double] = new Array[Double](16)
    }

  /** Same two-pass shape as [[CentroidArgMin.evalRow]]: raw distances
    * + raw min first (pure flops), then round-and-compare only the
    * candidates within one rounding bucket of the raw min — except the
    * tie-break compares CLUSTER IDS (they are per-row data here, not
    * a pre-sorted constant matrix).
    */
  def evalRow(csAny: Any, vAny: Any, nrm: Double): InternalRow = {
    val cs = csAny.asInstanceOf[ArrayData]
    val v = vAny.asInstanceOf[ArrayData]
    val k = cs.numElements()
    var buf = scratch.get()
    if (buf.length < k) { buf = new Array[Double](k); scratch.set(buf) }
    var m = 0.0
    var j = 0
    while (j < k) {
      val cand = cs.getStruct(j, 3)
      val cv = cand.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * cv.getDouble(i); i += 1 }
      val d2 = (nrm * nrm - 2.0 * dot) + cand.getDouble(2)
      buf(j) = d2
      if (j == 0 || less(d2, m)) m = d2
      j += 1
    }
    val cut = m + 1e-5 + 1e-9 * math.abs(m)
    var bestD = 0.0
    var bestC = 0
    var first0 = true
    j = 0
    while (j < k) {
      if (!(buf(j) > cut)) {
        val d2 = round6(buf(j))
        val cid = cs.getStruct(j, 3).getInt(0)
        // Spark double ordering ties: == for numbers, NaN = NaN
        val tie = d2 == bestD ||
          (java.lang.Double.isNaN(d2) && java.lang.Double.isNaN(bestD))
        if (first0 || less(d2, bestD) || (tie && cid < bestC)) {
          bestD = d2; bestC = cid; first0 = false
        }
      }
      j += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestC))
  }

  override def nullSafeEval(cs: Any, v: Any, n: Any): Any =
    evalRow(cs, v, n.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCellArgMin", this, classOf[CellArgMin].getName)
    nullSafeCodeGen(ctx, ev, (cs, v, n) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.evalRow($cs, $v, $n);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CellArgMin =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** 64-bit perceptual hash (aHash shape) of a binary payload —
  * `graft_phash(payload)`: the payload splits into 64 byte blocks and
  * bit j is whether block j's mean exceeds the global mean, compared
  * by integer cross-multiplication (`sums(j)·n > tot·cnts(j)`) so
  * there is no float anywhere. Bit-identical to the typed-Dataset
  * closure it replaces in [[graft.multimodal.Multimodal]] (spec-pinned
  * there) and to the mm_phash DuckDB oracle's integer SQL.
  *
  * Why an expression (guide §4.1): the closure formulation
  * (`as[(Long, Array[Byte])].flatMap`) forces a codegen break —
  * `DeserializeToObject` materializes every payload as a Scala tuple,
  * the loop runs on the object, and `SerializeFromObject` re-enters
  * Tungsten. The hash is pure integer arithmetic over the bytes, so it
  * belongs inside the scan's WholeStageCodegen projection. Total
  * function: callers filter `length(payload) >= 64` themselves (the
  * under-64-byte convention lives at the operator layer; on shorter
  * inputs the expression still returns a well-defined value).
  */
case class PHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash"

  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var tot = 0L
    var i = 0
    while (i < n) {
      val b = ((i.toLong * 64L) / n).toInt
      val v = bytes(i) & 0xff
      sums(b) += v; cnts(b) += 1; tot += v
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 64) { if (sums(j) * n > tot * cnts(j)) h |= (1L << j); j += 1 }
    h
  }

  override protected def nullSafeEval(a: Any): Any =
    hash(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPhash", this, classOf[PHash64].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.hash($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

object VectorExpressions {
  /** Register `graft_dot` / `graft_norm` — injected through
    * `SparkSessionExtensions` (the public extension API) by
    * [[graft.GraftSession]].
    */
  private def asDoubles(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) =>
        DotProduct(asDoubles(children(0)), asDoubles(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_norm"),
      (children: Seq[Expression]) => L2Norm(asDoubles(children.head))))
    ext.injectFunction((
      FunctionIdentifier("graft_isect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "graft_isect"),
      (children: Seq[Expression]) =>
        SortedIntersectCount(Cast(children(0), ArrayType(LongType)),
          Cast(children(1), ArrayType(LongType)))))
    ext.injectFunction((
      FunctionIdentifier("graft_argmin"),
      new ExpressionInfo(classOf[CentroidArgMin].getName, "graft_argmin"),
      (children: Seq[Expression]) => CentroidArgMin(
        Cast(children(0), ArrayType(ArrayType(DoubleType))),
        Cast(children(1), ArrayType(IntegerType)),
        asDoubles(children(2)), Cast(children(3), DoubleType))))
    ext.injectFunction((
      FunctionIdentifier("graft_phash"),
      new ExpressionInfo(classOf[PHash64].getName, "graft_phash"),
      (children: Seq[Expression]) => PHash64(Cast(children.head, BinaryType))))
    ext.injectFunction((
      FunctionIdentifier("graft_argmin_cell"),
      new ExpressionInfo(classOf[CellArgMin].getName, "graft_argmin_cell"),
      (children: Seq[Expression]) => CellArgMin(
        children(0), asDoubles(children(1)), Cast(children(2), DoubleType))))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) =>
        BloomMightContain(children(0), Cast(children(1), LongType))))
  }
}
