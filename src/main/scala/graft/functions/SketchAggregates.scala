package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{Sketches => ThetaSketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable-sketch aggregates the built-in surface lacks (Spark 4 ships
  * HLL only): Misra-Gries frequent items and theta set-operation sketches,
  * both over the DataSketches library Spark itself bundles for `hll_*`.
  *
  * Why `TypedImperativeAggregate` and not an `Aggregator` or UDAF: the
  * buffer is a live sketch OBJECT held per group in the object-hash
  * aggregate map, serialized only when partials cross a partition
  * boundary — exactly how Spark's own `HllSketchAgg` is built. An
  * `Aggregator` with a byte-array buffer would deserialize/reserialize
  * the sketch on every row.
  *
  * Scale contract (the reason these exist): per-partition partials are
  * constant-size (maxMapSize entries / 2^lgK hashes), so the exchange
  * moves kilobytes per group where exact top-k / distinct-intersection
  * would shuffle the full key stream. Both sketches merge associatively,
  * so pre-aggregated daily/shard partials can be stored and re-rolled
  * along any dimension without rescanning raw data.
  */
object SketchAggregates {

  private[functions] val stringSerDe = new ArrayOfStringsSerDe
}

/** Frequent-items (Misra-Gries / DataSketches ItemsSketch) heavy-hitter
  * aggregate over a string column.
  *
  *  - `maxMapSize` (power of 2) bounds sketch memory; the deterministic
  *    guarantee is `trueCount - est <= maxError <= streamLength * 3.5 /
  *    maxMapSize`, and `NO_FALSE_NEGATIVES` returns every item whose true
  *    count exceeds maxError (SketchesSpec pins both).
  *  - `topK` caps the emitted rows; items sort by (estimate desc, token
  *    asc) so output order is deterministic.
  *
  * Result: `array<struct<token, est, lb, ub>>` — lb/ub are the sketch's
  * per-item error envelope, surfaced so downstream consumers see the
  * uncertainty instead of a point estimate pretending to be exact.
  */
case class FrequentItemsAgg(
    child: Expression,
    maxMapSize: Int,
    topK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  require((maxMapSize & (maxMapSize - 1)) == 0 && maxMapSize >= 8,
    s"maxMapSize must be a power of 2 >= 8, got $maxMapSize")
  require(topK > 0, s"topK must be positive, got $topK")

  override def prettyName: String = "graft_freq_items"
  override def nullable: Boolean = false
  override def dataType: DataType = FrequentItemsAgg.resultType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(topK)
      .map { r =>
        InternalRow(UTF8String.fromString(r.getItem),
          r.getEstimate, r.getLowerBound, r.getUpperBound)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(SketchAggregates.stringSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), SketchAggregates.stringSerDe)

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrequentItemsAgg {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)
}

/** Theta-sketch distinct aggregate over a long or string key column.
  * Result is the serialized compact sketch (binary) — NOT an estimate —
  * so sketches can be stored, re-merged, and set-combined downstream
  * ([[ThetaEstimate]] / [[ThetaIntersectEstimate]] read them). This is
  * what HLL cannot do: theta sketches support INTERSECTION and
  * difference, the "distinct users who did A and B" question.
  *
  * Buffer is a live theta Union (accepts both raw updates and sketch
  * merges). With fewer than 2^lgK distinct keys the sketch is in exact
  * mode and estimates equal true counts (SketchesSpec pins it); beyond
  * that, relative error ~1/sqrt(2^lgK).
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")

  override def prettyName: String = "graft_theta_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long/int/string column, got ${other.catalogString}")
  }

  private def newUnion(): Union =
    ThetaSketches.setOperationBuilder().setLogNominalEntries(lgK).buildUnion()

  override def createAggregationBuffer(): Union = newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case StringType => buf.update(v.asInstanceOf[UTF8String].toString)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult()); a }

  override def eval(buf: Union): Any = buf.getResult().toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult().toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = newUnion()
    u.union(ThetaSketches.heapifyCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** KLL quantiles aggregate over a long/int column (x10/x11 — VERDICT
  * r14 #8): mergeable quantile summaries with a PROVABLE, merge-order-
  * INDEPENDENT rank-error bound, where the GK summaries behind Spark's
  * `percentile_approx` (x2/x7) carry no merge guarantee — their merged
  * error is order-dependent, which is exactly the property a 100 TB
  * shard-merge cannot live with (daily/shard partials re-rolled along
  * arbitrary dimensions must promise the same ±ε·n rank bound however
  * the merge tree shakes out; KLL's bound is ~1.33% of n at k=200 with
  * 99% confidence, DataSketches' published envelope, and
  * [[KllQuantilesAgg.normalizedRankError]] surfaces the library's own
  * figure for the spec to pin against).
  *
  * Buffer is a live heap [[KllLongsSketch]] (the HllSketchAgg pattern —
  * serialized only across partition boundaries). Result: one value per
  * requested probability, each answered under the INCLUSIVE search
  * criterion — probed empirically (25/25 across n ∈ {7..997}, q ∈
  * {0.1..0.9}): while the sketch never compacts (n ≤ k, retained == n)
  * the answer is EXACTLY the item at 1-based rank ceil(q·n) of the
  * group's sorted order, t11's oracle-deterministic discrete quantile —
  * the x7 capacity argument, which is what lets x11 run the identical
  * sketch path under a full DuckDB hash oracle while x10 keeps the
  * production k. */
case class KllQuantilesAgg(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllLongsSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probs must be in [0, 1], got $probs")

  override def prettyName: String = "graft_kll_quantiles"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long/int column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): org.apache.datasketches.kll.KllLongsSketch =
    org.apache.datasketches.kll.KllLongsSketch.newHeapInstance(k)

  override def update(buf: org.apache.datasketches.kll.KllLongsSketch,
                      input: InternalRow): org.apache.datasketches.kll.KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    buf
  }

  override def merge(a: org.apache.datasketches.kll.KllLongsSketch,
                     b: org.apache.datasketches.kll.KllLongsSketch)
      : org.apache.datasketches.kll.KllLongsSketch = { a.merge(b); a }

  override def eval(buf: org.apache.datasketches.kll.KllLongsSketch): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(probs.map[Any](q => buf.getQuantile(q,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
      .toArray)

  override def serialize(buf: org.apache.datasketches.kll.KllLongsSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.kll.KllLongsSketch =
    org.apache.datasketches.kll.KllLongsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KllQuantilesAgg {
  /** The library's single-sided normalized rank-error bound for `k`
    * (getQuantile path, 99% confidence) — the figure SketchesSpec's
    * envelope pins x10 against. */
  def normalizedRankError(k: Int): Double =
    org.apache.datasketches.kll.KllLongsSketch.newHeapInstance(k)
      .getNormalizedRankError(false)
}

/** The KLL sketch ITSELF as the aggregate result (x12 — the persisted
  * shard-summary half of the telemetry shape: the per-shard ingest
  * aggregates once and STORES the serialized sketch; later rollups
  * merge stored sketches without rescanning a row). Same buffer
  * lifecycle as [[KllQuantilesAgg]]; eval returns `toByteArray`. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllLongsSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def prettyName: String = "graft_kll_sketch"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long/int column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): org.apache.datasketches.kll.KllLongsSketch =
    org.apache.datasketches.kll.KllLongsSketch.newHeapInstance(k)

  override def update(buf: org.apache.datasketches.kll.KllLongsSketch,
                      input: InternalRow): org.apache.datasketches.kll.KllLongsSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buf.update(v.asInstanceOf[Long])
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    buf
  }

  override def merge(a: org.apache.datasketches.kll.KllLongsSketch,
                     b: org.apache.datasketches.kll.KllLongsSketch)
      : org.apache.datasketches.kll.KllLongsSketch = { a.merge(b); a }

  override def eval(buf: org.apache.datasketches.kll.KllLongsSketch): Any =
    buf.toByteArray

  override def serialize(buf: org.apache.datasketches.kll.KllLongsSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.kll.KllLongsSketch =
    org.apache.datasketches.kll.KllLongsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Quantiles from MERGING stored serialized KLL sketches (x12's query
  * half): the input column carries sketch bytes, never data rows —
  * update heapifies and merges each incoming sketch, partials merge
  * associatively, and the answer carries KLL's merge-order-INDEPENDENT
  * ±ε·n rank envelope however the merge tree shakes out (below
  * capacity it is exact — the x11 argument, which is what puts the
  * whole stored-merge path under a DuckDB hash oracle). */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.kll.KllLongsSketch]
  with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"probs must be in [0, 1], got $probs")

  override def prettyName: String = "graft_kll_merge_quantiles"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary sketch column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): org.apache.datasketches.kll.KllLongsSketch =
    org.apache.datasketches.kll.KllLongsSketch.newHeapInstance(k)

  override def update(buf: org.apache.datasketches.kll.KllLongsSketch,
                      input: InternalRow): org.apache.datasketches.kll.KllLongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(org.apache.datasketches.kll.KllLongsSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(a: org.apache.datasketches.kll.KllLongsSketch,
                     b: org.apache.datasketches.kll.KllLongsSketch)
      : org.apache.datasketches.kll.KllLongsSketch = { a.merge(b); a }

  override def eval(buf: org.apache.datasketches.kll.KllLongsSketch): Any =
    if (buf.isEmpty) null
    else new GenericArrayData(probs.map[Any](q => buf.getQuantile(q,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
      .toArray)

  override def serialize(buf: org.apache.datasketches.kll.KllLongsSketch): Array[Byte] =
    buf.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.kll.KllLongsSketch =
    org.apache.datasketches.kll.KllLongsSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Estimate of a serialized theta sketch. CodegenFallback is fine here:
  * it evaluates once per GROUP row (post-aggregation), never per input
  * row — the hot path is the codegen'd scan feeding the aggregate. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_theta_estimate"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary theta sketch, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ThetaSketches.heapifySketch(Memory.wrap(v.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Estimated size of the intersection of two serialized theta sketches —
  * the set operation that makes theta worth its bytes over HLL. Same
  * cold-path CodegenFallback rationale as [[ThetaEstimate]]. */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_theta_intersect"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary theta sketches, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaSketches.heapifySketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = ThetaSketches.heapifySketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    ThetaSketches.setOperationBuilder().buildIntersection()
      .intersect(sa, sb).getEstimate
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Estimated |A ∪ B| of two serialized theta sketches — the fourth
  * theta set operation, via a REAL DataSketches Union (not the
  * a+b−∩ arithmetic identity, which breaks down once either sketch
  * estimates): union-of-sketches is the operation stored per-shard
  * sketches are re-merged with, so x8's Jaccard reads
  * intersect/union straight from the same stored artifacts. Same
  * cold-path CodegenFallback rationale as [[ThetaEstimate]]. */
case class ThetaUnionEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_theta_union"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary theta sketches, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaSketches.heapifySketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = ThetaSketches.heapifySketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    val u = ThetaSketches.setOperationBuilder().buildUnion()
    u.union(sa)
    u.union(sb)
    u.getResult.getEstimate
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Estimated |A \ B| of two serialized theta sketches — the third theta
  * set operation beside estimate and intersection: "distinct users who
  * did A but never B" (churn/exclusivity questions) straight from
  * stored sketches, no raw-data rescan. Same cold-path CodegenFallback
  * rationale as [[ThetaEstimate]]. */
case class ThetaDiffEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_theta_diff"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary theta sketches, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = ThetaSketches.heapifySketch(Memory.wrap(a.asInstanceOf[Array[Byte]]))
    val sb = ThetaSketches.heapifySketch(Memory.wrap(b.asInstanceOf[Array[Byte]]))
    ThetaSketches.setOperationBuilder().buildANotB()
      .aNotB(sa, sb).getEstimate
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Point-count estimate of a serialized count-min sketch (the binary
  * Spark's built-in `count_min_sketch` aggregate emits) for a string
  * key. Probed with the key's UTF-8 BYTES — the exact representation
  * the aggregate fed `addBinary`, so probe and build hash identically.
  * Same cold-path CodegenFallback rationale as [[ThetaEstimate]]: this
  * evaluates once per PROBE row (a handful of keys), never per input
  * row. */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary count-min sketch, string key), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sk.asInstanceOf[Array[Byte]]))
    cms.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the sketch aggregates. */
object SketchFunctions {

  /** Heavy-hitter tokens: array<struct<token,est,lb,ub>>, top `k` by
    * estimate, memory bounded by `maxMapSize` entries per group. */
  def freqItems(col: Column, maxMapSize: Int, k: Int): Column =
    Bridge.column(
      FrequentItemsAgg(Bridge.expression(col), maxMapSize, k).toAggregateExpression())

  /** Mergeable theta distinct sketch (binary) of a key column. */
  def thetaSketch(col: Column, lgK: Int = 12): Column =
    Bridge.column(
      ThetaSketchAgg(Bridge.expression(col), lgK).toAggregateExpression())

  /** Distinct estimate of a serialized theta sketch. */
  def thetaEstimate(col: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expression(col)))

  /** Estimated |A ∩ B| of two serialized theta sketches. */
  def thetaIntersect(a: Column, b: Column): Column =
    Bridge.column(ThetaIntersectEstimate(Bridge.expression(a), Bridge.expression(b)))

  /** Point-count estimate of a serialized count-min sketch for a key. */
  def cmsEstimate(sketch: Column, key: Column): Column =
    Bridge.column(CountMinEstimate(Bridge.expression(sketch), Bridge.expression(key)))

  /** Estimated |A \ B| of two serialized theta sketches. */
  def thetaDiff(a: Column, b: Column): Column =
    Bridge.column(ThetaDiffEstimate(Bridge.expression(a), Bridge.expression(b)))

  /** Estimated |A ∪ B| of two serialized theta sketches. */
  def thetaUnion(a: Column, b: Column): Column =
    Bridge.column(ThetaUnionEstimate(Bridge.expression(a), Bridge.expression(b)))

  /** Mergeable KLL quantiles of a long/int column: array<long>, one
    * value per probability in `probs`. */
  def kllQuantiles(col: Column, k: Int, probs: Seq[Double]): Column =
    Bridge.column(
      KllQuantilesAgg(Bridge.expression(col), k, probs).toAggregateExpression())

  /** The serialized KLL sketch of a long/int column (binary) — the
    * per-shard summary a telemetry ingest persists (x12). */
  def kllSketch(col: Column, k: Int): Column =
    Bridge.column(
      KllSketchAgg(Bridge.expression(col), k).toAggregateExpression())

  /** Quantiles from merging stored serialized KLL sketches:
    * array<long>, one value per probability — no data-row rescan. */
  def kllMergeQuantiles(col: Column, k: Int, probs: Seq[Double]): Column =
    Bridge.column(
      KllMergeAgg(Bridge.expression(col), k, probs).toAggregateExpression())
}
