package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Corpus-scale BPE token-ID encoding as ONE Catalyst expression —
  * the tokenize-for-training step (r19): a raw document string in,
  * the model's `array<bigint>` token ids out, in one codegen'd map
  * with no shuffle and no per-merge plan growth.
  *
  * Semantics are [[graft.queries.TextOps.tokenizeText]]'s per-word
  * fold VERBATIM, lifted from the driver-side serving path to a
  * distributed kernel: split on `\s+`, drop empty tokens, encode each
  * word one spaced symbol per CODEPOINT (Java regex "." matches whole
  * surrogate pairs in `spacedChars`, so astral chars are one symbol
  * there and must be here too), apply the learned merges in order via
  * `String.replace` (leftmost non-overlapping — the training loop's
  * and [[BpeApply]]'s scan semantics), then map each surviving symbol
  * to its model-stable id: a merged symbol's id is `0x110000 + round
  * - 1` keyed by the FIRST round that produced the symbol string
  * (beyond the Unicode range, so the two id spaces can never
  * collide); a single-codepoint symbol's id is its codepoint.
  * [[graft.BpeEncodeSpec]] pins ids ≡ `tokenizeText` on sampled
  * documents through the real codegen path.
  *
  * Like [[BpeApply]], the merge table (and the symbol→id map built
  * from it) ships as ONE per-instance reference object into generated
  * code: plan size is O(1) in vocabulary size and the kernel runs
  * inside whole-stage codegen. Zipf makes the per-word work massively
  * redundant at corpus scale — the same head words re-segment
  * billions of times — so the kernel memoizes word→ids in a bounded
  * per-JVM concurrent map (entries are added until the cap, then the
  * cache is read-only: no eviction churn, deterministic output either
  * way; at a real corpus the head of the Zipf curve fits long before
  * the cap). */
case class BpeEncode(child: Expression, table: BpeEncode.EncodeTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode needs a string column, got $other")
    }

  override def nullSafeEval(s: Any): Any =
    BpeEncode.encode(s.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeTable", table,
      classOf[BpeEncode.EncodeTable].getName)
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeEncode.encode($s, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncode {

  /** Bounded word→ids memo size per model. 64Ki distinct words covers
    * the Zipf head that carries almost all occurrences; past the cap
    * the kernel just recomputes (correctness unchanged). */
  private val CacheCap = 1 << 16

  /** Per-JVM memo registry, keyed by [[EncodeTable.contentKey]]: one
    * shared word→ids memo per MODEL per executor JVM, however many
    * plans, tasks, or micro-batches reference the model (r19
    * advice-low — the memo used to live on the table instance, which
    * deserializes fresh per task). Bounded at [[RegistryCap]] models:
    * when a NEW model arrives at a full registry, the registry is
    * CLEARED and every model re-fills lazily — so a long-lived
    * service JVM rolling through content-addressed model versions
    * keeps sharing forever (model #65 must not silently revert to the
    * per-task empty-memo behavior this registry exists to eliminate —
    * review finding, r20), retired models' memos get dropped instead
    * of pinned for the JVM lifetime, and only the pathological case
    * of > 64 models LIVE at once thrashes (correctness unchanged —
    * the memo is a pure cache). */
  private val memoRegistry = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentHashMap[String, Array[Long]]]()

  private val RegistryCap = 64

  private[functions] def memoFor(key: String)
      : java.util.concurrent.ConcurrentHashMap[String, Array[Long]] = {
    if (memoRegistry.size >= RegistryCap && !memoRegistry.containsKey(key))
      memoRegistry.clear() // rare; racing clears are harmless (pure cache)
    memoRegistry.computeIfAbsent(key,
      _ => new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]())
  }

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** The learned merges as parallel pattern/replacement arrays plus
    * the merged-symbol id map, in learned order. A holder class so
    * plan strings render as a count, not 32k pairs ([[BpeApply]]'s
    * discipline). The memo resolves through the per-JVM
    * [[BpeEncode.memoFor]] registry by the table's content address:
    * the EncodeTable itself deserializes once per TASK (it rides the
    * task binary as a plan reference object), but every copy under
    * the same model — across tasks, queries, and micro-batches in one
    * executor JVM — shares ONE word→ids memo, so the Zipf head is
    * paid once per executor per MODEL (r19 advice-low: the old
    * per-instance transient map restarted empty on every task). */
  final class EncodeTable(val pats: Array[String], val reps: Array[String],
      val idOf: java.util.HashMap[String, java.lang.Long])
      extends Serializable {
    require(pats.length == reps.length, "merge table arity mismatch")
    /** Content address of the model: two tables built from the same
      * merges — even by different queries or Spark sessions — carry
      * the same key and therefore resolve the same shared memo. */
    val key: String = EncodeTable.contentKey(pats, reps, idOf)
    @transient lazy val memo = BpeEncode.memoFor(key)
    override def toString: String = s"merges(${pats.length})"
  }

  object EncodeTable {
    /** Deterministic content address over EVERYTHING `encode` reads —
      * the pattern/replacement arrays AND the symbol→id map
      * (length-prefixed UTF-8 + id longs into SHA-256, id entries in
      * sorted key order for map-iteration independence): the registry
      * key for [[BpeEncode.memoFor]]. The memo caches ids resolved
      * through `idOf`, so a hand-built table with the same merges but
      * a deviating id map must NOT share a memo (review finding,
      * r20) — the constructor is public and only the `from` path
      * derives `idOf` from the merges by construction. */
    def contentKey(pats: Array[String], reps: Array[String],
        idOf: java.util.HashMap[String, java.lang.Long]): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      def putStr(s: String): Unit = {
        val b = s.getBytes("UTF-8")
        md.update(java.nio.ByteBuffer.allocate(4).putInt(b.length).array())
        md.update(b)
      }
      pats.foreach(putStr); reps.foreach(putStr)
      idOf.entrySet().toArray(Array.empty[java.util.Map.Entry[String, java.lang.Long]])
        .sortBy(_.getKey).foreach { e =>
          putStr(e.getKey)
          md.update(java.nio.ByteBuffer.allocate(8)
            .putLong(e.getValue.longValue).array())
        }
      md.digest().map(b => f"$b%02x").mkString
    }

    /** Build from (l, r) merges in learned order: merged symbol `l+r`
      * gets id `0x110000 + round - 1`, first-producing round wins —
      * the exact id scheme `tokenizeText` serves. */
    def from(merges: Seq[(String, String)]): EncodeTable = {
      val idOf = new java.util.HashMap[String, java.lang.Long]()
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        idOf.putIfAbsent(l + r, java.lang.Long.valueOf(0x110000L + i))
      }
      new EncodeTable(
        merges.map { case (l, r) => s" $l  $r " }.toArray,
        merges.map { case (l, r) => s" $l$r " }.toArray,
        idOf)
    }
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def encode(s: UTF8String, table: EncodeTable): ArrayData = {
    val words = Ws.split(s.toString)
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        val ids = idsOf(w, table)
        var j = 0
        while (j < ids.length) { out += ids(j); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** One word's token ids under the model — `tokenizeText`'s per-word
    * fold, memoized. */
  private def idsOf(w: String, table: EncodeTable): Array[Long] = {
    val cached = table.memo.get(w)
    if (cached != null) return cached
    val sb = new java.lang.StringBuilder(w.length * 3)
    var k = 0
    while (k < w.length) {
      val cp = w.codePointAt(k)
      sb.append(' ').appendCodePoint(cp).append(' ')
      k += Character.charCount(cp)
    }
    var cur = sb.toString
    val pats = table.pats
    val reps = table.reps
    var m = 0
    while (m < pats.length) { cur = cur.replace(pats(m), reps(m)); m += 1 }
    val subs = cur.trim.split("  ")
    val ids = new Array[Long](subs.length)
    var j = 0
    while (j < subs.length) {
      val v = table.idOf.get(subs(j))
      ids(j) = if (v == null) subs(j).codePointAt(0).toLong else v.longValue
      j += 1
    }
    if (table.memo.size < CacheCap) table.memo.put(w, ids)
    ids
  }

  /** Column-level API: document text → `array<bigint>` token ids
    * under the learned merge table. */
  def encodeIds(s: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(
      BpeEncode(GraftSqlBridge.expression(s), EncodeTable.from(merges)))
}
