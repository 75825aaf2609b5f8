package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-backed bloom membership probe.
  *
  * The native `BloomFilterMightContain` requires its sketch child to
  * be FOLDABLE, so a prebuilt filter can only ride the plan as a
  * `Literal(bytes)`. That is the right call for the runtime-filter
  * sketches it was built for (≤ 8 MB under the default conf clamps)
  * — and exactly wrong for a fifth-decade arc-set bloom: a 141 MB
  * literal lands in the codegen reference array, the reference array
  * lands in the stage's task binary, and EVERY CONCURRENT TASK
  * deserializes its own private copy of the closure (Spark
  * deserializes `taskBinary.value` per task, not per executor) — 32
  * running tasks × 141 MB ≈ 4.5 GB of identical bitmaps per stage,
  * times the plan copies a warm-rep protocol keeps alive. That is
  * what OOM'd the r16 100× probe at the 32 g contract heap, in the
  * exact stage the bloom exists to protect.
  *
  * This expression carries a `Broadcast[Array[Byte]]` HANDLE instead
  * (a few bytes in the closure): the bitmap travels once per
  * executor via TorrentBroadcast, and the deserialized
  * [[BloomFilter]] is interned in a JVM-global cache keyed by
  * broadcast id — one long[] per executor JVM no matter how many
  * tasks, stages, or timed reps probe it. Codegen references the
  * expression object itself ([[CodegenContext.addReferenceObj]]) and
  * calls [[BloomMightContainBroadcast.probe]] per row, so the probe
  * stays inside whole-stage codegen like the literal form.
  *
  * Contract mirrors `might_contain`: the child is the SAME xxhash64
  * the build side aggregated (`BloomFilterAggregate` inserts the
  * child long via putLong), false positives at the built fpp, false
  * negatives never.
  */
object BloomExpressions {

  /** One deserialized filter per broadcast id per JVM, LRU-bounded:
    * repeated bench reps re-broadcast fresh blooms and nothing else
    * evicts the old ones (the map would otherwise grow by one bitmap
    * per rep for the life of the JVM).
    */
  private val MaxCached = 4
  private val cache =
    new java.util.LinkedHashMap[Long, BloomFilter](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, BloomFilter]): Boolean =
        size() > MaxCached
    }

  private[functions] def filterFor(bc: Broadcast[Array[Byte]]): BloomFilter =
    cache.synchronized {
      val hit = cache.get(bc.id)
      if (hit != null) hit
      else {
        val f = BloomFilter.readFrom(new ByteArrayInputStream(bc.value))
        cache.put(bc.id, f)
        f
      }
    }

  /** Membership probe of a prebuilt, broadcast bloom: `hash` must be
    * the xxhash64 column the filter was built over.
    */
  def mightContainBroadcast(bc: Broadcast[Array[Byte]],
      hash: Column): Column =
    GraftExpressionBridge.column(BloomMightContainBroadcast(bc,
      GraftExpressionBridge.expression(hash)))
}

case class BloomMightContainBroadcast(bc: Broadcast[Array[Byte]],
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "might_contain_broadcast"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires the bigint xxhash64 of the probe key, " +
        s"got ${child.dataType.catalogString}")

  /** Resolved once per deserialized expression copy (= once per task),
    * NOT per row: `filterFor` takes a global monitor and mutates the
    * access-ordered LRU even on hits, so calling it from `probe` would
    * serialize every concurrent task on one lock in the row loop —
    * the exact stage the bloom exists to relieve.
    */
  @transient private lazy val filter: BloomFilter =
    BloomExpressions.filterFor(bc)

  def probe(h: Long): Boolean = filter.mightContainLong(h)

  override protected def nullSafeEval(h: Any): Any =
    probe(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val ref = ctx.addReferenceObj("bloomProbe", this,
        classOf[BloomMightContainBroadcast].getName)
      s"${ev.value} = $ref.probe($h);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
