package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text profile: token count, distinct-token count, non-whitespace
  * char count, and per-dictionary stopword hit counts — everything q30/q31/
  * q32 need from a single tokenization of the document.
  *
  * Replaces the composed `size(filter(split(lower(text)), t ->
  * array_contains(...)))` pipeline, which (a) re-ran the regex split once per
  * referencing expression — q32 paid FOUR splits per row — and (b) dispatched
  * an interpreted lambda per token (higher-order functions don't participate
  * in codegen; the same per-element-dispatch penalty measured ~15× on
  * [[WordShingles]]). Driver bench r01: q31 11.5× baseline, q30 6.8×,
  * q32 2.3× — all from this one pattern.
  *
  * Parity contract (must keep matching the DuckDB oracle):
  * tokens = java-regex `\s+` split with limit -1 (leading run yields an
  * empty first token, trailing run an empty last token, "" yields [""]);
  * distinct counts RAW tokens; hit counts test LOWERCASED tokens
  * (`lower(text)` never adds/removes whitespace, so lowering per token is
  * identical to splitting `lower(text)`).
  */
case class TextProfile(child: Expression, dicts: Seq[Seq[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_text_profile requires string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_unique", LongType, nullable = false),
    StructField("n_nonws", LongType, nullable = false),
    StructField("hits", ArrayType(LongType, containsNull = false), nullable = false)))

  override def prettyName: String = "graft_text_profile"

  @transient private lazy val dictSets: Array[java.util.HashSet[String]] =
    dicts.map { d =>
      val s = new java.util.HashSet[String](d.size * 2)
      d.foreach(s.add)
      s
    }.toArray

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  override protected def nullSafeEval(input: Any): Any =
    profile(input.asInstanceOf[UTF8String])

  /** Public so generated code can call it directly. */
  def profile(input: UTF8String): InternalRow = {
    val raw = input.toString
    val len = raw.length
    val seen = new java.util.HashSet[String](64)
    val hits = new Array[Long](dictSets.length)
    var nTokens = 0L
    var nNonWs = 0L
    var i = 0
    var tokStart = 0
    // Emulate java String.split("\\s+", -1): boundaries at maximal
    // whitespace runs; leading run -> empty first token; trailing run ->
    // empty last token; "" -> one empty token.
    while (i <= len) {
      val atEnd = i == len
      if (atEnd || isWs(raw.charAt(i))) {
        val tok = raw.substring(tokStart, i)
        nTokens += 1
        seen.add(tok)
        val lower = tok.toLowerCase(java.util.Locale.ROOT)
        var d = 0
        while (d < hits.length) {
          if (dictSets(d).contains(lower)) hits(d) += 1
          d += 1
        }
        // skip the whitespace run
        var j = i
        while (j < len && isWs(raw.charAt(j))) { j += 1 }
        tokStart = j
        i = if (atEnd) i + 1 else j
        if (!atEnd && j == len) {
          // trailing run: emit the final empty token and stop
          nTokens += 1
          seen.add("")
          var d2 = 0
          while (d2 < hits.length) {
            if (dictSets(d2).contains("")) hits(d2) += 1
            d2 += 1
          }
          i = len + 1
        }
      } else {
        nNonWs += 1
        i += 1
      }
    }
    // nNonWs counted UTF-16 units of non-ws chars; convert to codepoints to
    // match Spark length(): subtract one per surrogate pair (ASCII: no-op).
    var sp = 0L
    var k = 0
    while (k < len) {
      if (Character.isHighSurrogate(raw.charAt(k)) && k + 1 < len &&
        Character.isLowSurrogate(raw.charAt(k + 1))) sp += 1
      k += 1
    }
    InternalRow(nTokens, seen.size.toLong, nNonWs - sp,
      new GenericArrayData(hits.map(Long.box)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("textProfile", this, classOf[TextProfile].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $self.profile($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
