package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product.
  *
  * `functions.aggregate(zip_with(a, b, _*_), 0.0, _+_)` evaluates the
  * lambda per element interpreted (higher-order functions never enter
  * whole-stage codegen), which dominates brute-force similarity scans.
  * This expression generates a tight primitive loop instead, keeping the
  * whole scan inside WholeStageCodegen — the difference between an
  * interpreted 34M-lambda plan and a vectorizable loop at 100 TB scale.
  *
  * Supports ARRAY<DOUBLE> and ARRAY<FLOAT> children (mixed is fine); null
  * elements are treated as 0 contribution is NOT supported — embeddings
  * are dense, and null elements would be a data bug upstream.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double>/array<float>, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  private def isFloat(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left.dataType)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right.dataType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Scalar-quantize a dense vector into PACKED BYTES — one unsigned byte
  * per dimension, `floor((v - min[i]) * 255/(max[i]-min[i]) + 0.5)` —
  * the storage layout that actually delivers the int8 quantization
  * memory story: a 64-dim vector shrinks from a 528-byte
  * UnsafeArrayData of doubles to a 64-byte binary, and every scored
  * pair in a top-k scan materializes that binary instead of two double
  * arrays.
  *
  * `mins`/`scales` are driver-held model state (one range aggregate,
  * like k-means centroids) baked in as literals — constant dimensions
  * carry scale 0 and quantize to 0. Values are clamped to 0..255 so a
  * query vector outside the corpus range still packs soundly.
  */
case class QuantizeToBytes(child: Expression, mins: Array[Double],
                           scales: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_bytes expects array<double>/array<float>, got ${other.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), mins.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var q = math.floor((x - mins(i)) * scales(i) + 0.5).toInt
      if (q < 0) q = 0
      if (q > 255) q = 255
      out(i) = q.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("scales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val q = ctx.freshName("q")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $minsRef.length);
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  int $q = (int) java.lang.Math.floor(
         |    (((double) $a.$get($i)) - $minsRef[$i]) * $scalesRef[$i] + 0.5);
         |  if ($q < 0) $q = 0;
         |  if ($q > 255) $q = 255;
         |  $out[$i] = (byte) $q;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "quantize_bytes"
}

/** Integer dot product of two byte-packed quantized vectors (unsigned
  * 0..255 per element) — the scoring kernel of quantized top-k search:
  * a tight primitive loop over two byte[]s inside WholeStageCodegen, no
  * per-pair array materialization. Max score 255²·dim stays far below
  * 2^63, so the long arithmetic is exact.
  */
case class ByteDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.BinaryType &&
        right.dataType == org.apache.spark.sql.types.BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_dot_product expects binary, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var s = 0L
    var i = 0
    while (i < n) {
      s += (x(i) & 0xff).toLong * (y(i) & 0xff).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long)($a[$i] & 0xff) * (long)($b[$i] & 0xff);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "byte_dot_product"
}

/** Per-cluster-cell nearest-neighbor cosine — the SemDeDup inner loop
  * as ONE expression over the cell's collected vectors instead of a
  * self-join: `array<struct<vec_id, ev>>` in, `array<struct<vec_id,
  * nn_cos>>` out, where `nn_cos` is each vector's max cosine against
  * its LOWER-id cell-mates (round-6, -1.0 when it has none — the
  * SemDeDup "keep the first, flag the rest" orientation).
  *
  * Why not the join: a cell of m vectors joined with itself
  * materializes m² rows each carrying BOTH dense vectors (~1 KB a
  * pair — tens of GB at sf1) just to feed a dot product and a max.
  * Here the m² loop runs over unpacked primitive arrays inside one
  * eval per CELL; only m input and m output rows ever exist. State is
  * the cell itself (the documented (n/k)² SemDeDup bound — pick k so
  * n/k fits an executor, exactly as before).
  */
case class CellMaxCosine(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("nn_cos", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
        s(0).dataType == LongType &&
        s(1).dataType.isInstanceOf[ArrayType] => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_max_cosine expects array<struct<id bigint, vec array>>, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val ids = new Array[Long](m)
    val vecs = new Array[Array[Double]](m)
    val norms = new Array[Double](m)
    var i = 0
    while (i < m) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      val v = row.getArray(1).toDoubleArray()
      vecs(i) = v
      var s = 0.0
      var d = 0
      while (d < v.length) { s += v(d) * v(d); d += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    val nn = Array.fill(m)(Double.NegativeInfinity)
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        val a = vecs(i); val b = vecs(j)
        var s = 0.0
        var d = 0
        val n = math.min(a.length, b.length)
        while (d < n) { s += a(d) * b(d); d += 1 }
        val c = s / (norms(i) * norms(j))
        // the max-of-round equals round-of-max (rounding is monotone),
        // so track the raw max and round once on output
        if (ids(i) < ids(j)) { if (c > nn(j)) nn(j) = c }
        else { if (c > nn(i)) nn(i) = c }
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      val v =
        if (nn(i) == Double.NegativeInfinity) -1.0
        else java.math.BigDecimal.valueOf(nn(i))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      out(i) = org.apache.spark.sql.catalyst.InternalRow(ids(i), v)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CellMaxCosine =
    copy(child = newChild)

  override def prettyName: String = "cell_max_cosine"
}

/** PQ ENCODE kernel: nearest codeword per subspace (fixed-point squared
  * L2, ties to the lower index), emitted as one byte per subspace. One
  * expression replaces an m·k-struct argmin tree — a tree that big
  * falls out of whole-stage codegen (64 KB method limit) and evaluates
  * interpreted per codeword; here the m×k×dsub loop is a single
  * primitive Java nest with the codebooks held as a reference object.
  * Distance algebra matches the replayable form exactly:
  * `floor((|s|² − 2·s·c + |c|²)·1e6 + 0.5)` with every dot an in-order
  * loop and the codeword norms precomputed driver-side.
  */
case class PqEncodeBytes(child: Expression,
                         books: Array[Array[Array[Double]]],
                         norms: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val m = books.length
    val dsub = books(0)(0).length
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      val base = mi * dsub
      var sn = 0.0
      var d = 0
      while (d < dsub) { val x = v.getDouble(base + d); sn += x * x; d += 1 }
      var best = Long.MaxValue
      var bj = 0
      var j = 0
      while (j < books(mi).length) {
        val cw = books(mi)(j)
        var ip = 0.0
        d = 0
        while (d < dsub) { ip += v.getDouble(base + d) * cw(d); d += 1 }
        val dist =
          math.floor((sn - 2.0 * ip + norms(mi)(j)) * 1e6 + 0.5).toLong
        if (dist < best) { best = dist; bj = j }
        j += 1
      }
      out(mi) = bj.toByte
      mi += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    val normsRef = ctx.addReferenceObj("pqNorms", norms, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val m = books.length
      val dsub = books(0)(0).length
      val out = ctx.freshName("out")
      val mi = ctx.freshName("mi")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val sn = ctx.freshName("sn")
      val ip = ctx.freshName("ip")
      val x = ctx.freshName("x")
      val best = ctx.freshName("best")
      val bj = ctx.freshName("bj")
      val dist = ctx.freshName("dist")
      val cw = ctx.freshName("cw")
      val base = ctx.freshName("base")
      s"""
         |byte[] $out = new byte[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $base = $mi * $dsub;
         |  double $sn = 0.0;
         |  for (int $d = 0; $d < $dsub; $d++) {
         |    double $x = $v.getDouble($base + $d);
         |    $sn += $x * $x;
         |  }
         |  long $best = java.lang.Long.MAX_VALUE;
         |  int $bj = 0;
         |  for (int $j = 0; $j < $booksRef[$mi].length; $j++) {
         |    double[] $cw = $booksRef[$mi][$j];
         |    double $ip = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $ip += $v.getDouble($base + $d) * $cw[$d];
         |    }
         |    long $dist = (long) java.lang.Math.floor(
         |      ($sn - 2.0 * $ip + $normsRef[$mi][$j]) * 1.0E6 + 0.5);
         |    if ($dist < $best) { $best = $dist; $bj = $j; }
         |  }
         |  $out[$mi] = (byte) $bj;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** Coarse-quantizer assignment kernel: nearest centroid by fixed-point
  * cosine (`floor(cos·1e6 + 0.5)`, ties to the lower centroid id) with
  * the centroid matrix held as a codegen reference object — the
  * unbounded-k companion to the literal-argmax trick
  * [[graft.sim.Similarity.kmeansAssign]] uses (a k-struct expression
  * tree stops fitting whole-stage codegen past a few dozen centroids,
  * and a broadcast cross-join materializes |corpus|·k pair rows each
  * carrying BOTH dense vectors). Here assignment is a primitive k×dim
  * loop per row: the corpus pass stays map-only at any cell count.
  * Fixed-point floor (not `round()`) keeps the comparison primitive in
  * Java and bit-replayable via the same floor formula in SQL.
  */
case class NearestCell(child: Expression, cents: Array[Array[Double]],
                       norms: Array[Double], ids: Array[Long])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell expects array<double>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    var sn = 0.0
    var d = 0
    while (d < dim) { val x = v.getDouble(d); sn += x * x; d += 1 }
    val vn = math.sqrt(sn)
    var best = Long.MinValue
    var bid = 0L
    var j = 0
    while (j < cents.length) {
      val cw = cents(j)
      var ip = 0.0
      d = 0
      while (d < dim && d < cw.length) { ip += v.getDouble(d) * cw(d); d += 1 }
      val s = math.floor((ip / (vn * norms(j))) * 1e6 + 0.5).toLong
      if (s > best) { best = s; bid = ids(j) }
      j += 1
    }
    bid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cells", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("cellNorms", norms, "double[]")
    val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val dim = ctx.freshName("dim")
      val sn = ctx.freshName("sn")
      val vn = ctx.freshName("vn")
      val ip = ctx.freshName("ip")
      val x = ctx.freshName("x")
      val d = ctx.freshName("d")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val bid = ctx.freshName("bid")
      val cw = ctx.freshName("cw")
      s"""
         |int $dim = $v.numElements();
         |double $sn = 0.0;
         |for (int $d = 0; $d < $dim; $d++) {
         |  double $x = $v.getDouble($d);
         |  $sn += $x * $x;
         |}
         |double $vn = java.lang.Math.sqrt($sn);
         |long $best = java.lang.Long.MIN_VALUE;
         |long $bid = 0L;
         |for (int $j = 0; $j < $centsRef.length; $j++) {
         |  double[] $cw = $centsRef[$j];
         |  double $ip = 0.0;
         |  for (int $d = 0; $d < $dim && $d < $cw.length; $d++) {
         |    $ip += $v.getDouble($d) * $cw[$d];
         |  }
         |  long $s = (long) java.lang.Math.floor(
         |    ($ip / ($vn * $normsRef[$j])) * 1.0E6 + 0.5);
         |  if ($s > $best) { $best = $s; $bid = $idsRef[$j]; }
         |}
         |${ev.value} = $bid;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_cell"
}

/** Asymmetric-distance (ADC) scoring kernel for product-quantized
  * search: `codes` is the corpus vector's byte-packed PQ code (one
  * codeword index per subspace), `lut` the query's per-subspace
  * lookup table of fixed-point inner products against every codeword
  * (`array<array<bigint>>`, built once per query). The approximate
  * score is the table-lookup sum — m lookups per pair instead of a
  * dim-length dot product, the classic PQ fast path (Jégou et al.
  * 2011). Fixed-point longs keep the sum order-independent and exact,
  * so any engine replays it bit-for-bit; the loop is a tight primitive
  * scan inside WholeStageCodegen.
  */
case class PqAdcScore(codes: Expression, lut: Expression)
    extends BinaryExpression {

  override def left: Expression = codes
  override def right: Expression = lut

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, lut.dataType) match {
      case (org.apache.spark.sql.types.BinaryType,
            ArrayType(ArrayType(org.apache.spark.sql.types.LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, l) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (binary, array<array<bigint>>), got " +
          s"${c.sql} and ${l.sql}")
    }

  override def nullSafeEval(c: Any, l: Any): Any = {
    val cs = c.asInstanceOf[Array[Byte]]
    val luts = l.asInstanceOf[ArrayData]
    val n = math.min(cs.length, luts.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += luts.getArray(i).getLong(cs(i) & 0xff)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($c.length, $l.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $l.getArray($i).getLong($c[$i] & 0xff);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, lut = newRight)

  override def prettyName: String = "pq_adc_score"
}

object VectorFunctions {
  /** Codegen'd dot product of two dense vector columns. */
  def dotProduct(a: Column, b: Column): Column =
    shim.column(DotProduct(shim.expression(a), shim.expression(b)))

  def l2Norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotProduct(a, a))

  /** Pack a vector into scalar-quantized bytes (model state as literals). */
  def quantizeBytes(v: Column, mins: Array[Double], scales: Array[Double]): Column =
    shim.column(QuantizeToBytes(shim.expression(v), mins, scales))

  /** Exact integer dot product over byte-packed quantized vectors. */
  def byteDotProduct(a: Column, b: Column): Column =
    shim.column(ByteDotProduct(shim.expression(a), shim.expression(b)))

  /** SemDeDup cell pass: per-vector max cosine vs lower-id cell-mates. */
  def cellMaxCosine(vs: Column): Column =
    shim.column(CellMaxCosine(shim.expression(vs)))

  /** PQ asymmetric-distance score: table-lookup sum of a byte-packed
    * code against a per-query fixed-point LUT.
    */
  def pqAdcScore(codes: Column, lut: Column): Column =
    shim.column(PqAdcScore(shim.expression(codes), shim.expression(lut)))

  /** PQ encode: nearest codeword per subspace, one byte each. */
  def pqEncodeBytes(v: Column, books: Array[Array[Array[Double]]]): Column = {
    val norms = books.map(_.map(cw => cw.map(x => x * x).sum))
    shim.column(PqEncodeBytes(shim.expression(v), books, norms))
  }

  /** Map-only coarse-cell assignment against driver-held centroids
    * (`(id, vector)` pairs, iterated in ascending id order — ties go to
    * the lower id).
    */
  def nearestCell(v: Column, cents: Array[(Long, Array[Double])]): Column = {
    val sorted = cents.sortBy(_._1)
    val norms = sorted.map { case (_, c) =>
      math.sqrt(c.map(x => x * x).sum)
    }
    shim.column(NearestCell(shim.expression(v), sorted.map(_._2),
      norms, sorted.map(_._1)))
  }
}
