package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the training-data extensions — the
  * operators Spark's built-in function set can't express cleanly
  * (SURVEY.md §7.4: "only custom-Catalyst candidates").
  *
  * Each is a native `Expression` rather than a Scala UDF: no
  * serialize/deserialize per row, null handling from
  * `UnaryExpression`/`BinaryExpression`, and `doGenCode` emitting one
  * fused Java loop per call so the host projection stays inside
  * whole-stage codegen (an interpreted eval fallback exists for
  * non-codegen contexts).
  */
object GraftExpressions {

  /** 64-bit SimHash of a token array (near-duplicate fingerprint).
    *
    * For each token, xxhash64(token, seed=42); each of the 64 hash bits
    * votes ±1; the sign of each bit's tally becomes that output bit.
    * Documents differing in a few tokens land within a small Hamming
    * distance — pair candidates come from matching 16-bit bands (see
    * `graft.ops.Dedup.simHashPairs`). Deterministic, data-independent.
    */
  /** Accept-only check shared by the token-array expressions. */
  private def requireArrayOf(e: Expression, name: String,
                             ok: DataType => Boolean,
                             expected: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(et, _) if ok(et) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires $expected, got ${other.catalogString}")
    }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, "simhash64", _ == StringType, "array<string>")
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
    // Every local is ctx.freshName'd: nullSafeCodeGen inlines this block
    // into the host function WITHOUT braces when the child is
    // non-nullable, so fixed names ("i") collide across expressions in
    // the same projection ("Redefinition of local variable" at compile;
    // Spark then silently falls back to the interpreted path).
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (counts, i, s, h, b, b2, out) = (ctx.freshName("counts"),
        ctx.freshName("i"), ctx.freshName("s"), ctx.freshName("h"),
        ctx.freshName("b"), ctx.freshName("b2"), ctx.freshName("out"))
      nullSafeCodeGen(ctx, ev, arr => s"""
        |int[] $counts = new int[64];
        |for (int $i = 0; $i < $arr.numElements(); $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
        |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
        |    for (int $b = 0; $b < 64; $b++) {
        |      if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
        |    }
        |  }
        |}
        |long $out = 0L;
        |for (int $b2 = 0; $b2 < 64; $b2++) { if ($counts[$b2] > 0) $out |= (1L << $b2); }
        |${ev.value} = $out;
        |""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** 64-bit SimHash from Karp–Rabin affine bit votes — the
    * ORACLE-REPLAYABLE production default (same policy as
    * [[KrMinHashSignature]]: the path users call for near-dup must be
    * SQL-verifiable; [[SimHash64]]'s seeded xxhash64 bits have no
    * DuckDB counterpart and stay as the perf-only variant). Per token:
    * the rolling polynomial hash folded into [0, p) over the
    * Park–Miller prime, then output bit j votes on bit 15 of
    * (g·a_j + b_j) mod p — the same a_j = 48271^(j+1) mod p,
    * b_j = (j+1)·2654435761 mod p permutation family the MinHash
    * oracle already inlines, so one constants table serves both. Bit j
    * of the sketch is the strict-majority vote across tokens. */
  case class KrSimHash64(child: Expression) extends UnaryExpression {
    private val P = 2147483647L
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, "kr_simhash64", _ == StringType, "array<string>")
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val bytes = arr.getUTF8String(i).getBytes
          var h = 0L
          var bi = 0
          while (bi < bytes.length) { h = h * 1000003L + (bytes(bi) & 0xffL); bi += 1 }
          val g = ((h % P) + P) % P
          var a = 1L
          var j = 0
          while (j < 64) {
            a = a * 48271L % P
            val t = (g * a + (j + 1) * 2654435761L % P) % P
            if (((t >> 15) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (counts, i, bytes, h, bi, g, a, j, t, out, b2) = (ctx.freshName("counts"),
        ctx.freshName("i"), ctx.freshName("bytes"), ctx.freshName("h"),
        ctx.freshName("bi"), ctx.freshName("g"), ctx.freshName("a"),
        ctx.freshName("j"), ctx.freshName("t"), ctx.freshName("out"),
        ctx.freshName("b2"))
      nullSafeCodeGen(ctx, ev, arr => s"""
        |int[] $counts = new int[64];
        |for (int $i = 0; $i < $arr.numElements(); $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    byte[] $bytes = $arr.getUTF8String($i).getBytes();
        |    long $h = 0L;
        |    for (int $bi = 0; $bi < $bytes.length; $bi++) {
        |      $h = $h * 1000003L + ($bytes[$bi] & 0xffL);
        |    }
        |    long $g = (($h % ${P}L) + ${P}L) % ${P}L;
        |    long $a = 1L;
        |    for (int $j = 0; $j < 64; $j++) {
        |      $a = $a * 48271L % ${P}L;
        |      long $t = ($g * $a + ($j + 1) * 2654435761L % ${P}L) % ${P}L;
        |      if ((($t >> 15) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
        |    }
        |  }
        |}
        |long $out = 0L;
        |for (int $b2 = 0; $b2 < 64; $b2++) { if ($counts[$b2] > 0) $out |= (1L << $b2); }
        |${ev.value} = $out;
        |""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): KrSimHash64 =
      copy(child = newChild)
  }

  /** Karp–Rabin rolling polynomial fingerprint of a string (document
    * fingerprinting for the text-analysis surface): h = Σ h*B + c over
    * UTF-8 bytes, natural 64-bit overflow. Cheap, order-sensitive, and
    * stable across partitions/engines — unlike `hashCode`. */
  case class RollingHash64(child: Expression) extends UnaryExpression {
    private val B = 1000003L
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_hash64 requires string, got ${other.catalogString}")
    }
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[UTF8String].getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = h * B + (bytes(i) & 0xffL); i += 1 }
      java.lang.Long.valueOf(h)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (bytes, h, i) =
        (ctx.freshName("bytes"), ctx.freshName("h"), ctx.freshName("i"))
      nullSafeCodeGen(ctx, ev, s => s"""
        |byte[] $bytes = $s.getBytes();
        |long $h = 0L;
        |for (int $i = 0; $i < $bytes.length; $i++) { $h = $h * ${B}L + ($bytes[$i] & 0xffL); }
        |${ev.value} = $h;
        |""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
      copy(child = newChild)
  }

  /** 16-bin histogram of a binary payload's high nibbles — the
    * deterministic stand-in "feature extraction" for the multimodal
    * surface (real decode libs aren't in this container; the Spark-side
    * plumbing — binary column in, fixed-width feature vector out — is the
    * part that must be real, SURVEY.md §7.4). */
  case class ByteHistogram(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"byte_histogram requires binary, got ${other.catalogString}")
    }
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val hist = new Array[Long](16)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xf0) >>> 4) += 1; i += 1 }
      new GenericArrayData(hist)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (hist, i) = (ctx.freshName("hist"), ctx.freshName("i"))
      nullSafeCodeGen(ctx, ev, bin => s"""
        |long[] $hist = new long[16];
        |for (int $i = 0; $i < $bin.length; $i++) { $hist[($bin[$i] & 0xf0) >>> 4]++; }
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($hist);
        |""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): ByteHistogram =
      copy(child = newChild)
  }

  /** MinHash signature of a shingle array: element k = min over shingles
    * of hash_k(shingle), where hash_0 = xxhash64(bytes) and hash_k =
    * xxhash64(hash_0, seed=k) — one fused loop hashing each shingle's
    * bytes exactly once. The higher-order-function formulation
    * (`transform(sequence(...), k -> array_min(transform(...)))`) is
    * interpreted and re-evaluates its child per k (measured 40× slower);
    * this expression replaced it plus the persist() barrier it needed. */
  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, "minhash_signature", _ == StringType, "array<string>")
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i)
          val h0 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          var k = 0
          while (k < numHashes) {
            val hk = XXH64.hashLong(h0, k.toLong)
            if (hk < mins(k)) mins(k) = hk
            k += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (mins, i, s, h0, k, hk) = (ctx.freshName("mins"), ctx.freshName("i"),
        ctx.freshName("s"), ctx.freshName("h0"), ctx.freshName("k"),
        ctx.freshName("hk"))
      nullSafeCodeGen(ctx, ev, arr => s"""
        |long[] $mins = new long[$numHashes];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |for (int $i = 0; $i < $arr.numElements(); $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
        |    long $h0 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
        |    for (int $k = 0; $k < $numHashes; $k++) {
        |      long $hk = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($h0, (long) $k);
        |      if ($hk < $mins[$k]) $mins[$k] = $hk;
        |    }
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        |""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** MinHash signature from Karp–Rabin affine permutations — the
    * ORACLE-REPLAYABLE production default (round-4 verdict: the path
    * users call for near-dup must be verifiable, and seeded xxhash64
    * has no SQL counterpart). Per shingle: the 64-bit rolling
    * polynomial hash ([[RollingHash64]]) folded into [0, p) over the
    * Park–Miller prime p = 2^31-1, then hash j = (g·a_j + b_j) mod p
    * with a_j = 48271^(j+1) mod p, b_j = (j+1)·2654435761 mod p;
    * element j of the signature is the min over shingles. Identical
    * arithmetic to the HOF formulation in the `dedup_lsh_kr` query and
    * its DuckDB replay (HUGEINT mod-2^64 fold, BIGINT permutations),
    * but one fused loop hashing each shingle's bytes exactly once —
    * same shape (and cost: one mul+add+mod per permutation, cheaper
    * than xxhash64's avalanche) as [[MinHashSignature]]. */
  case class KrMinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    private val P = 2147483647L
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, "kr_minhash_signature", _ == StringType, "array<string>")
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val bytes = arr.getUTF8String(i).getBytes
          var h = 0L
          var bi = 0
          while (bi < bytes.length) { h = h * 1000003L + (bytes(bi) & 0xffL); bi += 1 }
          val g = ((h % P) + P) % P
          var a = 1L
          var j = 0
          while (j < numHashes) {
            a = a * 48271L % P
            val hj = (g * a + (j + 1) * 2654435761L % P) % P
            if (hj < mins(j)) mins(j) = hj
            j += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (mins, i, bytes, h, bi, g, a, j, hj) = (ctx.freshName("mins"),
        ctx.freshName("i"), ctx.freshName("bytes"), ctx.freshName("h"),
        ctx.freshName("bi"), ctx.freshName("g"), ctx.freshName("a"),
        ctx.freshName("j"), ctx.freshName("hj"))
      nullSafeCodeGen(ctx, ev, arr => s"""
        |long[] $mins = new long[$numHashes];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |for (int $i = 0; $i < $arr.numElements(); $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    byte[] $bytes = $arr.getUTF8String($i).getBytes();
        |    long $h = 0L;
        |    for (int $bi = 0; $bi < $bytes.length; $bi++) {
        |      $h = $h * 1000003L + ($bytes[$bi] & 0xffL);
        |    }
        |    long $g = (($h % ${P}L) + ${P}L) % ${P}L;
        |    long $a = 1L;
        |    for (int $j = 0; $j < $numHashes; $j++) {
        |      $a = $a * 48271L % ${P}L;
        |      long $hj = ($g * $a + ($j + 1) * 2654435761L % ${P}L) % ${P}L;
        |      if ($hj < $mins[$j]) $mins[$j] = $hj;
        |    }
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        |""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): KrMinHashSignature =
      copy(child = newChild)
  }

  /** Dot product of two numeric arrays in double precision — native
    * replacement for `aggregate(zip_with(a, b, _*_), 0d, _+_)`: the
    * higher-order-function chain is CodegenFallback (interpreted, one
    * boxed lambda call per element) where this is a single generated
    * fused loop. Null elements count as 0. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = (t: DataType) => t == FloatType || t == DoubleType
      requireArrayOf(left, "dot_product", ok, "array<float|double>") match {
        case TypeCheckResult.TypeCheckSuccess =>
          requireArrayOf(right, "dot_product", ok, "array<float|double>")
        case fail => fail
      }
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0
      var i = 0
      if (isFloat(left) && isFloat(right)) {
        while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
      } else {
        while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
      }
      java.lang.Double.valueOf(dot)
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val get = if (isFloat(left)) "getFloat" else "getDouble"
      val getR = if (isFloat(right)) "getFloat" else "getDouble"
      val (n, dot, i) =
        (ctx.freshName("n"), ctx.freshName("dot"), ctx.freshName("i"))
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += (double)$a.$get($i) * (double)$b.$getR($i);
        |}
        |${ev.value} = $dot;
        |""".stripMargin)
    }
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity of two numeric arrays — one fused pass computing
    * dot and both norms (three interpreted HOF pipelines otherwise);
    * 0.0 when either norm is zero. */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = (t: DataType) => t == FloatType || t == DoubleType
      requireArrayOf(left, "cosine_sim", ok, "array<float|double>") match {
        case TypeCheckResult.TypeCheckSuccess =>
          requireArrayOf(right, "cosine_sim", ok, "array<float|double>")
        case fail => fail
      }
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val (fl, fr) = (isFloat(left), isFloat(right))
      while (i < n) {
        val x = if (fl) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (fr) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      java.lang.Double.valueOf(if (denom == 0.0) 0.0 else dot / denom)
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val get = if (isFloat(left)) "getFloat" else "getDouble"
      val getR = if (isFloat(right)) "getFloat" else "getDouble"
      val (n, dot, na, nb, i, x, y, denom) = (ctx.freshName("n"),
        ctx.freshName("dot"), ctx.freshName("na"), ctx.freshName("nb"),
        ctx.freshName("i"), ctx.freshName("x"), ctx.freshName("y"),
        ctx.freshName("denom"))
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $x = (double)$a.$get($i);
        |  double $y = (double)$b.$getR($i);
        |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |}
        |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        |${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
        |""".stripMargin)
    }
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): CosineSimilarity =
      copy(left = newLeft, right = newRight)
  }

  /** Fraction of agreeing positions in two MinHash signatures
    * (array<long>) — the MinHash Jaccard estimate (Broder 1997). One
    * fused codegen'd loop; the previous `zip_with`+`filter`+`size`
    * formulation was three interpreted HOF passes evaluated per
    * candidate pair, the hot path of the LSH verify stage. */
  case class SigAgreement(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = (t: DataType) => t == LongType
      requireArrayOf(left, "sig_agreement", ok, "array<bigint>") match {
        case TypeCheckResult.TypeCheckSuccess =>
          requireArrayOf(right, "sig_agreement", ok, "array<bigint>")
        case fail => fail
      }
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
      val n = math.min(a.numElements(), b.numElements())
      var agree = 0
      var i = 0
      while (i < n) {
        if (a.getLong(i) == b.getLong(i)) agree += 1
        i += 1
      }
      java.lang.Double.valueOf(if (n == 0) 0.0 else agree.toDouble / n)
    }
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val (n, agree, i) =
        (ctx.freshName("n"), ctx.freshName("agree"), ctx.freshName("i"))
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |int $agree = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($a.getLong($i) == $b.getLong($i)) $agree++;
        |}
        |${ev.value} = ($n == 0) ? 0.0 : (double)$agree / (double)$n;
        |""".stripMargin)
    }
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): SigAgreement =
      copy(left = newLeft, right = newRight)
  }

  /** Word n-gram shingle GENERATOR (the UDTF surface, SURVEY.md §2.J):
    * one output row per shingle of the input text — lowercase, trimmed,
    * whitespace-tokenized, texts shorter than `n` words collapsing to a
    * single whole-text shingle (identical semantics to
    * [[graft.ops.Dedup.shingles]], property-tested against it).
    *
    * As a `Generator` the shingles stream straight into the child
    * consumer; the array-expression + `explode` alternative first
    * materializes the full shingle array per document — for a 1 MB
    * document that is a ~1 MB transient array per row in the scan
    * projection. Interpreted eval (`CodegenFallback`), like most
    * built-in generators' non-codegen paths; the per-row work is
    * string slicing, not expression evaluation, so the fallback seam
    * costs little. */
  case class ExplodeShingles(child: Expression, n: Int)
      extends UnaryExpression with Generator with CodegenFallback {
    override def elementSchema: StructType =
      new StructType().add("shingle", StringType, nullable = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"explode_shingles requires string, got ${other.catalogString}")
    }
    override def eval(input: InternalRow): IterableOnce[InternalRow] = {
      val raw = child.eval(input)
      if (raw == null) return Iterator.empty
      val words = raw.asInstanceOf[UTF8String].toString
        .trim.toLowerCase.split("\\s+")
      if (words.length < n)
        Iterator.single(InternalRow(UTF8String.fromString(words.mkString(" "))))
      else
        Iterator.range(0, words.length - n + 1).map(i =>
          InternalRow(UTF8String.fromString(words.slice(i, i + n).mkString(" "))))
    }
    override protected def withNewChildInternal(newChild: Expression): ExplodeShingles =
      copy(child = newChild)
  }

  /** Z-order (Morton) interleave of two dimension keys — the clustering
    * key behind multi-column data skipping ([[graft.ops.Layout]]).
    *
    * Bit i of `x` lands at output bit 2i, bit i of `y` at 2i+1, over the
    * low 31 bits of each input (inputs are masked with 2^31−1, so the
    * result is a non-negative 62-bit long). Sorting a table by this key
    * makes any contiguous z-range span a NARROW range of BOTH dimensions,
    * so parquet row-group min/max stats prune scans filtered on either
    * column — a single-column sort only ever prunes one. The curve order
    * is meaningful for non-negative inputs below 2^31; larger keys should
    * be bucketed into that range first (the masking keeps the expression
    * total rather than failing).
    *
    * Deterministic pure bit math: DuckDB replays it exactly
    * (`lay_zorder` oracle) with a `list_sum` over `range(0, 31)`.
    */
  case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"zorder2 requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
      }
    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[Long] & 0x7FFFFFFFL
      val y = b.asInstanceOf[Long] & 0x7FFFFFFFL
      var z = 0L
      var i = 0
      while (i < 31) {
        z |= ((x >>> i) & 1L) << (2 * i)
        z |= ((y >>> i) & 1L) << (2 * i + 1)
        i += 1
      }
      java.lang.Long.valueOf(z)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (x, y, z, i) = (ctx.freshName("zx"), ctx.freshName("zy"),
        ctx.freshName("zz"), ctx.freshName("zi"))
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |long $x = $a & 0x7FFFFFFFL;
        |long $y = $b & 0x7FFFFFFFL;
        |long $z = 0L;
        |for (int $i = 0; $i < 31; $i++) {
        |  $z |= (($x >>> $i) & 1L) << (2 * $i);
        |  $z |= (($y >>> $i) & 1L) << (2 * $i + 1);
        |}
        |${ev.value} = $z;
        |""".stripMargin)
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): ZOrder2 =
      copy(left = newLeft, right = newRight)
  }

  /** 3-D Morton interleave: the LOW 21 BITS of each input, bit i of
    * input j landing at position 3i + j — per-file min/max ranges stay
    * tight in all THREE dimensions, so a predicate on any one of them
    * prunes ([[ZOrder2]]'s contract, one dimension wider; Delta/Iceberg
    * `ZORDER BY (a, b, c)`). Same 31→21-bit trade the 2-D form makes
    * at 31: the curve key must fit one long. */
  case class ZOrder3(first: Expression, second: Expression,
                     third: Expression) extends TernaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      (first.dataType, second.dataType, third.dataType) match {
        case (LongType, LongType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (a, b, c) => TypeCheckResult.TypeCheckFailure(
          s"zorder3 requires (bigint, bigint, bigint), got " +
            s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
      }
    override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
      val x = a.asInstanceOf[Long] & 0x1FFFFFL
      val y = b.asInstanceOf[Long] & 0x1FFFFFL
      val w = c.asInstanceOf[Long] & 0x1FFFFFL
      var z = 0L
      var i = 0
      while (i < 21) {
        z |= ((x >>> i) & 1L) << (3 * i)
        z |= ((y >>> i) & 1L) << (3 * i + 1)
        z |= ((w >>> i) & 1L) << (3 * i + 2)
        i += 1
      }
      java.lang.Long.valueOf(z)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (x, y, w, z, i) = (ctx.freshName("zx"), ctx.freshName("zy"),
        ctx.freshName("zw"), ctx.freshName("zz"), ctx.freshName("zi"))
      nullSafeCodeGen(ctx, ev, (a, b, c) => s"""
        |long $x = $a & 0x1FFFFFL;
        |long $y = $b & 0x1FFFFFL;
        |long $w = $c & 0x1FFFFFL;
        |long $z = 0L;
        |for (int $i = 0; $i < 21; $i++) {
        |  $z |= (($x >>> $i) & 1L) << (3 * $i);
        |  $z |= (($y >>> $i) & 1L) << (3 * $i + 1);
        |  $z |= (($w >>> $i) & 1L) << (3 * $i + 2);
        |}
        |${ev.value} = $z;
        |""".stripMargin)
    }
    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): ZOrder3 =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  /** HILBERT index of two dimension keys — [[ZOrder2]]'s
    * locality-superior sibling (Delta Lake's liquid clustering moved
    * from Morton to Hilbert for exactly this): consecutive curve
    * positions are ALWAYS grid neighbors, so a sorted-by-key file's
    * bounding box is tighter than Morton's (whose curve takes 2^k-long
    * diagonal jumps between quadrant blocks, periodically inflating a
    * file's min/max range in both dimensions).
    *
    * Standard iterative base-conversion (the classic `xy2d` of Hilbert
    * 1891 via Butz's algorithm, as on the public curve literature):
    * walk the 31 levels from the top; at each level the quadrant pair
    * `(rx, ry)` contributes `s² · ((3·rx) XOR ry)` and the lower
    * levels' frame rotates/reflects when `ry = 0`. Inputs mask to the
    * low 31 bits each (same contract as [[ZOrder2]]); the result is a
    * non-negative 62-bit long. Deterministic pure integer math: DuckDB
    * replays it bit-for-bit with a 31-step recursive CTE
    * (`lay_hilbert` oracle). */
  case class Hilbert2(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"hilbert2 requires (bigint, bigint), got (${l.catalogString}, ${r.catalogString})")
      }
    override def nullSafeEval(a: Any, b: Any): Any = {
      var x = a.asInstanceOf[Long] & 0x7FFFFFFFL
      var y = b.asInstanceOf[Long] & 0x7FFFFFFFL
      var d = 0L
      var s = 1L << 30
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      java.lang.Long.valueOf(d)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (x, y, d, s, rx, ry, t) = (ctx.freshName("hx"), ctx.freshName("hy"),
        ctx.freshName("hd"), ctx.freshName("hs"), ctx.freshName("hrx"),
        ctx.freshName("hry"), ctx.freshName("ht"))
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        |long $x = $a & 0x7FFFFFFFL;
        |long $y = $b & 0x7FFFFFFFL;
        |long $d = 0L;
        |for (long $s = 1L << 30; $s > 0; $s >>= 1) {
        |  long $rx = (($x & $s) > 0) ? 1L : 0L;
        |  long $ry = (($y & $s) > 0) ? 1L : 0L;
        |  $d += $s * $s * ((3L * $rx) ^ $ry);
        |  if ($ry == 0) {
        |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
        |    long $t = $x; $x = $y; $y = $t;
        |  }
        |}
        |${ev.value} = $d;
        |""".stripMargin)
    }
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Hilbert2 =
      copy(left = newLeft, right = newRight)
  }

  /** Product-quantization encoder (Jégou/Douze/Schmid, "Product
    * quantization for nearest neighbor search", TPAMI 2011): the input
    * vector is quantized to exact integers (`floor(x·scale)`), split
    * into `m` subspaces of `subDim` dims, and each subspace is coded as
    * the index of its nearest codeword (integer L2², ties to the
    * smaller index). Returns `array<int>` of length `m` — a 64-dim
    * float vector compresses to m bytes of codes, the asset an ADC scan
    * ranks without touching raw vectors.
    *
    * Integer quantization end to end so encode AND the downstream
    * asymmetric-distance score are engine-exact (the same trick as
    * `sim_topk_quantized`) — seeded-float k-means codebooks would make
    * the whole path unverifiable. The codebook ships as one flat long[]
    * reference object (`codebook[(s·ksub + c)·subDim + i]`), one fused
    * loop per row: each element is quantized exactly once, then m·ksub
    * integer L2 probes — no HOF re-evaluation, stays in whole-stage
    * codegen. */
  case class PqEncode(child: Expression, codebook: Array[Long],
                      m: Int, ksub: Int, subDim: Int, scale: Int)
      extends UnaryExpression {
    require(codebook.length == m * ksub * subDim,
      s"codebook must hold m*ksub*subDim = ${m * ksub * subDim} longs")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    private def isFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, "pq_encode",
        t => t == FloatType || t == DoubleType, "array<float|double>")
    /** A vector whose length differs from m·subDim is corrupt input; the
      * earlier min-clamp silently zero-padded/truncated it into a
      * plausible-but-wrong code. Fail loudly instead. A null ELEMENT is
      * the same class of corruption, checked per element below — it
      * cannot be rejected at the type level because parquet always marks
      * array elements nullable (`containsNull=true`) even for columns
      * that hold none, and unchecked it would NPE under interpreted eval
      * on GenericArrayData but silently read as 0.0 from UnsafeArrayData
      * under codegen: divergent plausible-but-wrong codes. */
    private def badLength(got: Int): Nothing =
      throw new IllegalArgumentException(
        s"pq_encode: vector length $got != m*subDim = ${m * subDim}")
    /** Codegen entry point for the same failure (generated code can only
      * call public members of the referenced expression object). */
    def badLengthPublic(got: Int): Unit = badLength(got)
    def badNullElementPublic(at: Int): Unit =
      throw new IllegalArgumentException(
        s"pq_encode: null element at index $at in input vector")
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = m * subDim
      if (arr.numElements() != n) badLength(arr.numElements())
      val qv = new Array[Long](m * subDim)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) badNullElementPublic(i)
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        qv(i) = math.floor(x * scale).toLong
        i += 1
      }
      val codes = new Array[Int](m)
      var s = 0
      while (s < m) {
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < ksub) {
          var d = 0L
          var j = 0
          while (j < subDim) {
            val diff = qv(s * subDim + j) - codebook((s * ksub + c) * subDim + j)
            d += diff * diff
            j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        codes(s) = best
        s += 1
      }
      new GenericArrayData(codes)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cb = ctx.addReferenceObj("pqCodebook", codebook, "long[]")
      val get = if (isFloat) "getFloat" else "getDouble"
      val (n, qv, i, codes, s, best, bestD, c, d, j, diff) =
        (ctx.freshName("n"), ctx.freshName("qv"), ctx.freshName("i"),
          ctx.freshName("codes"), ctx.freshName("s"), ctx.freshName("best"),
          ctx.freshName("bestD"), ctx.freshName("c"), ctx.freshName("d"),
          ctx.freshName("j"), ctx.freshName("diff"))
      val self = ctx.addReferenceObj("pqEncodeExpr", this,
        classOf[PqEncode].getName)
      nullSafeCodeGen(ctx, ev, arr => s"""
        |int $n = ${m * subDim};
        |if ($arr.numElements() != $n) { $self.badLengthPublic($arr.numElements()); }
        |long[] $qv = new long[${m * subDim}];
        |for (int $i = 0; $i < $n; $i++) {
        |  if ($arr.isNullAt($i)) { $self.badNullElementPublic($i); }
        |  $qv[$i] = (long) java.lang.Math.floor((double)$arr.$get($i) * $scale);
        |}
        |int[] $codes = new int[$m];
        |for (int $s = 0; $s < $m; $s++) {
        |  int $best = 0;
        |  long $bestD = Long.MAX_VALUE;
        |  for (int $c = 0; $c < $ksub; $c++) {
        |    long $d = 0L;
        |    for (int $j = 0; $j < $subDim; $j++) {
        |      long $diff = $qv[$s * $subDim + $j] - $cb[($s * $ksub + $c) * $subDim + $j];
        |      $d += $diff * $diff;
        |    }
        |    if ($d < $bestD) { $bestD = $d; $best = $c; }
        |  }
        |  $codes[$s] = $best;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
        |""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): PqEncode =
      copy(child = newChild)
  }

  /** Word n-gram shingle ARRAY of a text column — the fused-loop form of
    * [[graft.ops.Dedup.shingles]]'s original built-in composition
    * `transform(sequence(0, size(words)-n), i => concat_ws(" ",
    * slice(words, i+1, n)))`. That shape is O(words²): higher-order
    * functions evaluate interpreted and re-evaluate the full
    * `split(text)` subtree PER SHINGLE (the same trap lineDedup's
    * segmentation hit — profiled as the dominant cost of every shingle
    * consumer: contamination, minhash signatures, n-gram stats). Here
    * the text is trimmed, lowercased and split ONCE per row and the
    * overlapping n-grams are sliced out of the token array in one
    * linear pass, with the regex compiled once per expression instead
    * of per row.
    *
    * Semantics byte-identical to the original (oracle-checked by the
    * full shingle-consumer query suite): Spark `trim` = ASCII-space
    * trim (`UTF8String.trim`), Spark `lower` (`UTF8String.toLowerCase`),
    * Spark `split(_, "\\s+")` = java regex split with limit -1 (leading
    * empty token preserved for non-space leading whitespace), documents
    * shorter than `n` words collapse to one whole-text shingle, null in
    * → null out. */
  case class ShinglesArray(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "shingle width must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingles_array requires string, got ${other.catalogString}")
    }
    @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
    /** Public: called from generated code (one virtual call per row). */
    def shingleArray(input: UTF8String): ArrayData = {
      val words = ws.split(input.trim().toLowerCase.toString, -1)
      if (words.length < n) {
        new GenericArrayData(Array[Any](UTF8String.fromString(words.mkString(" "))))
      } else {
        val out = new Array[Any](words.length - n + 1)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < out.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j))
            j += 1
          }
          out(i) = UTF8String.fromString(sb.toString)
          i += 1
        }
        new GenericArrayData(out)
      }
    }
    override def nullSafeEval(input: Any): Any =
      shingleArray(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("shinglesArray", this,
        classOf[ShinglesArray].getName)
      nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $self.shingleArray($in);")
    }
    override protected def withNewChildInternal(newChild: Expression): ShinglesArray =
      copy(child = newChild)
  }

  /** Count of array elements present in a fixed reference string set —
    * the benchmark-contamination membership probe as a single scan-pass
    * expression. The set ships once per expression instance (the
    * benchmark shingle list — eval sets are KBs against a lake-scale
    * corpus) and is built into a hash set lazily per executor; each row
    * then pays O(|array|) probes with NO explode, NO join and NO
    * aggregation — the previous explode→broadcast-join→groupBy shape
    * materialized one row per (doc, shingle) and re-aggregated by id,
    * which at sf0.1 was 4.8 s of the 8 s curation pipeline for what is
    * semantically a per-row projection. Exact string membership (same
    * semantics as the SQL string equi-join oracle) — no hashing, no
    * collision caveat. Null elements count as misses, matching the
    * left-join's null-never-equals. */
  case class ShingleOverlapCount(child: Expression, bench: Array[String])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, "shingle_overlap_count", _ == StringType, "array<string>")
    @transient private lazy val benchSet: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](math.max(16, bench.length * 2))
      bench.foreach(b => s.add(UTF8String.fromString(b)))
      s
    }
    /** Public: called from generated code (one virtual call per ROW —
      * the per-element loop stays inside, so the host stage's codegen
      * span is unbroken). */
    def countOverlap(arr: ArrayData): Long = {
      var n = 0L
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i) && benchSet.contains(arr.getUTF8String(i))) n += 1
        i += 1
      }
      n
    }
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(countOverlap(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("shingleOverlap", this,
        classOf[ShingleOverlapCount].getName)
      nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.countOverlap($arr);")
    }
    override protected def withNewChildInternal(newChild: Expression): ShingleOverlapCount =
      copy(child = newChild)
  }

  /** Count of array elements that MIGHT be in a Bloom filter — the
    * lake-scale variant of [[ShingleOverlapCount]]'s membership probe.
    *
    * [[ShingleOverlapCount]] ships the benchmark shingle SET inside the
    * expression, which is right while eval sets are KBs; a consolidated
    * decontamination list (every benchmark + held-out set, 10⁷–10⁸
    * shingles) stops fitting in an expression constant long before it
    * stops fitting in executor memory. This probe ships only the
    * serialized `org.apache.spark.util.sketch.BloomFilter` bits (a few
    * MB at fpp=1e-2 over 10⁷ items, built DISTRIBUTED by
    * `TextAnalysis.contaminationBloom`), deserialized lazily once per
    * executor. One-sided error: a hit may be false (verified exactly
    * downstream on the hit docs only), a miss is definitive — so
    * `might_contain_count = 0` proves a document clean without any join.
    * Probes use the UTF-8 bytes (`mightContainBinary`), symmetric with
    * the build's `putBinary`. Null elements count as misses, matching
    * [[ShingleOverlapCount]]. */
  case class BloomMightContainCount(child: Expression, bloomBytes: Array[Byte])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireArrayOf(child, "bloom_might_contain_count", _ == StringType, "array<string>")
    @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bloomBytes))
    /** Public: called from generated code (one virtual call per row;
      * the per-element loop stays inside). */
    def countMightContain(arr: ArrayData): Long = {
      var n = 0L
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i) &&
            bloom.mightContainBinary(arr.getUTF8String(i).getBytes)) n += 1
        i += 1
      }
      n
    }
    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(countMightContain(input.asInstanceOf[ArrayData]))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("bloomMightContain", this,
        classOf[BloomMightContainCount].getName)
      nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $self.countMightContain($arr);")
    }
    override protected def withNewChildInternal(newChild: Expression): BloomMightContainCount =
      copy(child = newChild)
  }

  /** Whitespace-token stopword profile in ONE tokenize pass:
    * `[n_tokens, hits(sets(0)), …, hits(sets(k-1))]`.
    *
    * Replaces the per-set `size(filter(split(lower(trim(text)), "\\s+"),
    * t => t.isInCollection(words)))` stack in
    * [[graft.ops.TextAnalysis.langId]]/`qualityScore`, which evaluated
    * the regex split once PER SET (5× per row across the two, each
    * inside a non-codegen `ArrayFilter`). Tokenization is byte-identical
    * to Spark's `split(lower(trim(text)), "\\s+")`: UTF8String ASCII-
    * space trim, UTF8String (locale-independent) lowercase, java regex
    * split with limit -1 — empty-token artifacts (empty string → [""],
    * leading non-space whitespace) are COUNTED in `n_tokens` exactly as
    * `size(...)` counts them, and probe the sets as the empty string
    * (never a member). Counts are Int, matching `size(filter(...))`. */
  case class StopwordStats(child: Expression, sets: Seq[Seq[String]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"stopword_stats requires string, got ${other.catalogString}")
    }
    @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
    @transient private lazy val probes: Array[java.util.HashSet[String]] =
      sets.map { s =>
        val h = new java.util.HashSet[String](math.max(16, s.size * 2))
        s.foreach(h.add)
        h
      }.toArray
    /** Public: called from generated code (one virtual call per row). */
    def stats(input: UTF8String): ArrayData = {
      val toks = ws.split(input.trim().toLowerCase.toString, -1)
      val out = new Array[Int](1 + probes.length)
      out(0) = toks.length
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        var j = 0
        while (j < probes.length) {
          if (probes(j).contains(t)) out(j + 1) += 1
          j += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }
    override def nullSafeEval(input: Any): Any =
      stats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("stopwordStats", this,
        classOf[StopwordStats].getName)
      nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $self.stats($in);")
    }
    override protected def withNewChildInternal(newChild: Expression): StopwordStats =
      copy(child = newChild)
  }

  /** Character-class census in ONE code-point pass:
    * `[n_chars, n_letters, n_digits09, n_punct, n_cjk, n_alnum_runs,
    * n_alnum_runs_gt4]`.
    *
    * Replaces the `length(regexp_replace(text, <class>, ""))` stack —
    * each of those allocates the stripped copy of the document just to
    * take its length, and txt_quality/txt_lang_id/txt_stats/
    * txt_tokens_bpe between them paid five such passes per row. Class
    * semantics are exactly the Java-regex ones the originals (and the
    * DuckDB oracle) use, per code point:
    *  - `n_chars`     = `length(text)` (code points);
    *  - `n_letters`   = `[\p{L}]` (Unicode letter categories ==
    *                    `Character.isLetter`);
    *  - `n_digits09`  = `[0-9]` (ASCII only, as docStats declares);
    *  - `n_punct`     = NOT (`\p{L}` | `\p{N}` | java-regex `\s`
    *                    (ASCII whitespace));
    *  - `n_cjk`       = `[一-鿿]`;
    *  - `n_alnum_runs` / `_gt4` = maximal `[\p{L}\p{N}]+` runs (and
    *    those longer than 4 code points) — exactly the non-empty tokens
    *    of `split(text, "[^\p{L}\p{N}]+")`, the BPE-ish piece counts. */
  case class CharClassStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_class_stats requires string, got ${other.catalogString}")
    }
    /** Public: called from generated code (one virtual call per row). */
    def stats(input: UTF8String): ArrayData = {
      val s = input.toString
      var n, letters, digits, punct, cjk, runs, longRuns, runLen = 0
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        i += Character.charCount(cp)
        n += 1
        val t = Character.getType(cp)
        val isLetter = t == Character.UPPERCASE_LETTER ||
          t == Character.LOWERCASE_LETTER || t == Character.TITLECASE_LETTER ||
          t == Character.MODIFIER_LETTER || t == Character.OTHER_LETTER
        val isNumber = t == Character.DECIMAL_DIGIT_NUMBER ||
          t == Character.LETTER_NUMBER || t == Character.OTHER_NUMBER
        val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
          cp == '\f' || cp == '\r'
        if (isLetter) letters += 1
        if (cp >= '0' && cp <= '9') digits += 1
        if (!isLetter && !isNumber && !isWs) punct += 1
        if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
        if (isLetter || isNumber) runLen += 1
        else if (runLen > 0) {
          runs += 1; if (runLen > 4) longRuns += 1; runLen = 0
        }
      }
      if (runLen > 0) { runs += 1; if (runLen > 4) longRuns += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array(n, letters, digits, punct, cjk, runs, longRuns))
    }
    override def nullSafeEval(input: Any): Any =
      stats(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val self = ctx.addReferenceObj("charClassStats", this,
        classOf[CharClassStats].getName)
      nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $self.stats($in);")
    }
    override protected def withNewChildInternal(newChild: Expression): CharClassStats =
      copy(child = newChild)
  }

  // -------- Column wrappers --------

  private def c(e: Expression): Column = GraftSqlBridge.column(e)
  private def e(col: Column): Expression = GraftSqlBridge.expression(col)

  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))
  def minhash_signature(shingles: Column, numHashes: Int): Column =
    c(MinHashSignature(e(shingles), numHashes))
  def kr_minhash_signature(shingles: Column, numHashes: Int): Column =
    c(KrMinHashSignature(e(shingles), numHashes))
  def kr_simhash64(tokens: Column): Column = c(KrSimHash64(e(tokens)))
  def rolling_hash64(text: Column): Column = c(RollingHash64(e(text)))
  def byte_histogram(bin: Column): Column = c(ByteHistogram(e(bin)))
  def dot_product(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))
  def cosine_sim(a: Column, b: Column): Column = c(CosineSimilarity(e(a), e(b)))
  def sig_agreement(a: Column, b: Column): Column = c(SigAgreement(e(a), e(b)))
  def explode_shingles(text: Column, n: Int): Column = c(ExplodeShingles(e(text), n))
  def zorder2(x: Column, y: Column): Column =
    c(ZOrder2(e(x.cast("long")), e(y.cast("long"))))
  def zorder3(x: Column, y: Column, z: Column): Column =
    c(ZOrder3(e(x.cast("long")), e(y.cast("long")), e(z.cast("long"))))
  def hilbert2(x: Column, y: Column): Column =
    c(Hilbert2(e(x.cast("long")), e(y.cast("long"))))
  def pq_encode(vec: Column, codebook: Array[Long], m: Int, ksub: Int,
                subDim: Int, scale: Int = 1000): Column =
    c(PqEncode(e(vec), codebook, m, ksub, subDim, scale))
  def shingle_overlap_count(shingles: Column, bench: Array[String]): Column =
    c(ShingleOverlapCount(e(shingles), bench))
  def bloom_might_contain_count(shingles: Column, bloomBytes: Array[Byte]): Column =
    c(BloomMightContainCount(e(shingles), bloomBytes))
  def shingles_array(text: Column, n: Int): Column =
    c(ShinglesArray(e(text), n))
  def stopword_stats(text: Column, sets: Seq[Seq[String]]): Column =
    c(StopwordStats(e(text), sets))
  def char_class_stats(text: Column): Column =
    c(CharClassStats(e(text)))

  /** SQL registration so the expressions are usable from `spark.sql`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64", exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("kr_simhash64", exprs => KrSimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("rolling_hash64", exprs => RollingHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("byte_histogram", exprs => ByteHistogram(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("sig_agreement", exprs => SigAgreement(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("zorder2", exprs => ZOrder2(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("zorder3", exprs => ZOrder3(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("hilbert2", exprs => Hilbert2(exprs(0), exprs(1)), "built-in")
  }
}
