package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Tokenizer-faithful BPE token counting.
 *
 * `TextFunctions.tokenCount` (alnum runs) and the GPT-2-style
 * PRE-tokenization proxy both over/under-count vs a real subword
 * tokenizer, so packing budgets computed from them drift from the token
 * counts training actually sees. This expression counts MERGED-BPE
 * tokens: each word's characters are repeatedly merged by a (pair →
 * rank) table — always the lowest-rank adjacent pair, all its
 * occurrences, until no merge applies — exactly the reference BPE
 * algorithm (Sennrich et al. 2016; the GPT-2 encoder's `bpe()` loop),
 * and the count is the number of surviving segments.
 *
 * Why a native expression and not `functions._`: BPE is a data-dependent
 * fixed-point loop (merge until quiescent) over each word. Declarative
 * higher-order functions express only bounded-depth folds — encoding "a
 * merge pass that repeats until no pair matches" needs either a
 * worst-case-depth expression tree (word length × vocab, interpreted
 * per element, unusably slow — the same reason FloatVectorDot exists) or
 * a UDF (opaque to codegen, serialization overhead per row). Like
 * FloatVectorDot, this stays INSIDE whole-stage codegen via
 * `doGenCode`; the merge table rides along as a codegen reference
 * object, the Catalyst-native equivalent of a broadcast: shipped once
 * per plan, shared across rows (with a bounded per-executor word-count
 * cache — Zipf reuse makes most words cache hits).
 *
 * Pre-tokenization matches [[graft.functions.TextFunctions.tokens]]
 * (lowercased maximal `[a-z0-9]+` runs) so counts stay comparable with
 * the engine's other token statistics; characters outside the vocab
 * count one token each (byte-fallback analog).
 */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val matcher = new BpeMatcher(merges)

  override def nullSafeEval(input: Any): Any =
    matcher.countText(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMatcher", matcher, classOf[BpeMatcher].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countText($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * The merge-ranks model: (pair → rank) lookup plus the reference merge
 * loop. One instance per plan (codegen reference object), shared by every
 * task thread — the word cache is a bounded ConcurrentHashMap.
 */
final class BpeMatcher(merges: Seq[(String, String)]) extends Serializable {
  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + "\u0001" + b, i) }
    m
  }
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val MaxCache = 1 << 16
  private val MaxCachedWordLen = 32

  /** Merged-BPE token count of one word (reference algorithm: repeatedly
    * merge every occurrence of the lowest-rank adjacent pair). */
  def countWord(word: String): Long = {
    if (word.length <= 1) return word.length.toLong
    val cached = if (word.length <= MaxCachedWordLen) cache.get(word) else null
    if (cached != null) return cached.longValue()
    var parts = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { parts.add(String.valueOf(word.charAt(i))); i += 1 }
    var done = false
    while (!done && parts.size() > 1) {
      // lowest-rank adjacent pair present in the word
      var best = -1
      var bestRank = Integer.MAX_VALUE
      var j = 0
      while (j < parts.size() - 1) {
        val r = rank.get(parts.get(j) + "\u0001" + parts.get(j + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        // merge ALL occurrences of that pair, left to right
        val a = parts.get(best)
        val b = parts.get(best + 1)
        val next = new java.util.ArrayList[String](parts.size())
        var k = 0
        while (k < parts.size()) {
          if (k < parts.size() - 1 && parts.get(k) == a && parts.get(k + 1) == b) {
            next.add(a + b); k += 2
          } else { next.add(parts.get(k)); k += 1 }
        }
        parts = next
      }
    }
    val n = parts.size().toLong
    if (word.length <= MaxCachedWordLen && cache.size() < MaxCache)
      cache.put(word, java.lang.Long.valueOf(n))
    n
  }

  /** Sum of [[countWord]] over the text's lowercased `[a-z0-9]+` runs.
    * Lowercasing goes through Spark's OWN `UTF8String.toLowerCase` — the
    * exact code `lower()` runs — so run segmentation can never diverge
    * from `TextFunctions.tokens` by JVM default locale (a tr_TR executor
    * lowercases 'I' differently under plain `String.toLowerCase`) or by
    * multi-char expansions (U+0130 → "i" + combining dot). */
  def countText(text: String): Long = {
    val t = org.apache.spark.unsafe.types.UTF8String.fromString(text)
      .toLowerCase.toString
    var total = 0L
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= t.length) {
      val c = if (i < t.length) t.charAt(i) else ' '
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) sb.append(c)
      else if (sb.length() > 0) { total += countWord(sb.toString); sb.setLength(0) }
      i += 1
    }
    total
  }
}

object BpeExpressions {
  /** Merged-BPE token count of `text` under a merge-ranks table. */
  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text), merges))
}
