package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 FunctionCatalog — the V2 function extension surface: the
  * engine's portable primitives (h60, cosine) registered as CATALOG
  * functions callable from bare SQL text (`graftfn.ns.h60(expr)`), the
  * way Iceberg ships its bucket/truncate transforms. Both functions
  * implement the MAGIC METHOD contract (`invoke` with exact argument
  * types), so Catalyst compiles the call to a codegen'd StaticInvoke /
  * Invoke instead of the row-boxing `produceResult` fallback
  * (ApplyFunctionExpression) — PlanGateSpec pins the fast path in the
  * plan; q107 hash-verifies the results against the oracle's
  * arithmetic re-derivation.
  */
class GraftFunctionCatalog extends FunctionCatalog {
  private var catalogName: String = _
  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name
  override def name(): String = catalogName

  override def listFunctions(ns: Array[String]): Array[Identifier] =
    Array(Identifier.of(ns, "h60"), Identifier.of(ns, "cosinef"))

  override def loadFunction(ident: Identifier): UnboundFunction =
    ident.name().toLowerCase match {
      case "h60" => new H60Unbound
      case "cosinef" => new CosineFUnbound
      case _ => throw new NoSuchFunctionException(ident)
    }
}

/** h60(string) → bigint: the portable md5-prefix hash every
  * oracle-checked pseudo-random gate derives from
  * (functions/PortableHash.h60 — DuckDB re-derives it as
  * ('0x' || substr(md5(x), 1, 15))::BIGINT).
  */
final class H60Unbound extends UnboundFunction {
  override def name(): String = "h60"
  override def description(): String =
    "h60(str) -> bigint: portable md5-prefix hash (60-bit, nonnegative)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1 &&
      inputType.head.dataType == StringType,
      s"h60 expects one STRING argument, got $inputType")
    new H60Bound
  }
}

final class H60Bound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = LongType
  override def name(): String = "h60"
  override def canonicalName(): String = "graft.h60"
  override def isResultNullable: Boolean = false
  /** the magic method — Catalyst binds it via Invoke (codegen) */
  def invoke(s: UTF8String): Long =
    graft.functions.PortableHash.h60(s.getBytes)
  override def produceResult(input: InternalRow): java.lang.Long =
    invoke(input.getUTF8String(0))
}

/** cosinef(array<float>, array<float>) → double: cosine similarity
  * with the engine's division order (dot / nrm(a) / nrm(b) — the s15
  * oracle convention; each float widened to double before any
  * arithmetic, accumulation left-to-right, so DuckDB's
  * list_dot_product over cast lists reproduces it bit-for-bit).
  */
final class CosineFUnbound extends UnboundFunction {
  override def name(): String = "cosinef"
  override def description(): String =
    "cosinef(array<float>, array<float>) -> double cosine similarity"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2 && inputType.forall(f =>
      f.dataType == ArrayType(FloatType) ||
        f.dataType == ArrayType(FloatType, containsNull = false)),
      s"cosinef expects two ARRAY<FLOAT> arguments, got $inputType")
    new CosineFBound
  }
}

final class CosineFBound extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(FloatType), ArrayType(FloatType))
  override def resultType(): DataType = DoubleType
  override def name(): String = "cosinef"
  override def canonicalName(): String = "graft.cosinef"
  /** the magic method — Catalyst binds it via Invoke (codegen) */
  def invoke(a: ArrayData, b: ArrayData): Double = {
    // fail-fast on ragged pairs: a partial cosine over the common
    // prefix is plausible-but-wrong, and the DuckDB oracle's
    // list_dot_product errors on unequal lengths
    require(a.numElements() == b.numElements(),
      s"cosinef: dimension mismatch ${a.numElements()} vs " +
        s"${b.numElements()}")
    val n = a.numElements()
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }
  override def produceResult(input: InternalRow): java.lang.Double =
    invoke(input.getArray(0), input.getArray(1))
}
