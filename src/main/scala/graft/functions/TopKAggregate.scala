package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-group top-k as a [[TypedImperativeAggregate]] — the
  * two-phase replacement for `row_number().over(Window.partitionBy(g))`
  * ranking.
  *
  * The window form is a scale-killer when one group's candidate set is
  * data-sized: every candidate row shuffles to ONE task which then sorts
  * the whole group (a PQ ADC pass scores the entire corpus per query, so
  * at 100 TB a single query's billions of scored rows would sort on one
  * executor). This aggregate keeps AT MOST k entries per group in each
  * partial buffer, so the map side reduces every input partition to k rows
  * per group before the shuffle, and the reduce side merges
  * partitions × k bounded heaps — no task ever holds or sorts a
  * group-sized partition. Same partial-aggregate discipline as the salted
  * hot-key aggregation in [[graft.operators.Skew]].
  *
  * Ordering contract (shared with the window form it replaces and the
  * DuckDB oracles): rank by score DESC, ties by id ASC, double compares
  * via Spark's SQL ordering (NaN greatest, -0.0 == 0.0). Null scores and
  * null ids are SKIPPED — a null cosine means a zero vector, which has no
  * meaningful rank (the window form ranked them last; they only surfaced
  * when a group had fewer than k real candidates).
  *
  * Output: `array<struct<score: double, id: idType>>` sorted best-first —
  * `posexplode` it to recover (rank, id, score) rows.
  */
case class TopKByScore(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  private def score: Expression = left
  private def id: Expression = right

  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double score, got ${score.dataType.simpleString}")
    else id.dataType match {
      case LongType | IntegerType | StringType =>
        if (k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a long, int or string id, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = true),
    StructField("id", id.dataType, nullable = true))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKHeap =
    new TopKHeap(k, TopKHeap.idComparator(id.dataType))

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // unsafe-row values are buffer-backed and reused across rows — copy
      // anything retained past this call
      val owned = i match {
        case u: UTF8String => u.clone()
        case other => other
      }
      buffer.insert(s.asInstanceOf[Double], owned)
    }
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    other.foreach((s, i) => buffer.insert(s, i))
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.sortedBestFirst.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { (s, i) =>
      out.writeDouble(s)
      i match {
        case l: java.lang.Long => out.writeByte(0); out.writeLong(l)
        case n: java.lang.Integer => out.writeByte(1); out.writeInt(n)
        case u: UTF8String =>
          val bytes = u.getBytes
          out.writeByte(2); out.writeInt(bytes.length); out.write(bytes)
        case other => throw new IllegalStateException(
          s"topk_by_score: unsupported id value class ${other.getClass}")
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val buffer = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val idVal: Any = in.readByte() match {
        case 0 => java.lang.Long.valueOf(in.readLong())
        case 1 => java.lang.Integer.valueOf(in.readInt())
        case 2 =>
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          UTF8String.fromBytes(bytes)
        case t => throw new IllegalStateException(
          s"topk_by_score: bad id type tag $t")
      }
      buffer.insert(s, idVal)
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

/** Bounded binary heap holding the current top-k (score, id) entries;
  * the ROOT is the WORST retained entry, so an incoming candidate either
  * beats the root (replace + sift) or is dropped in O(1). Never allocates
  * beyond k slots — the whole point of the two-phase rank.
  */
final class TopKHeap(k: Int, idCmp: (Any, Any) => Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Any](k)
  private var n = 0

  def size: Int = n

  /** a ranks strictly lower than b: smaller score, or tied score and
    * LARGER id (rank order is score desc, id asc).
    */
  private def worse(sa: Double, ia: Any, sb: Double, ib: Any): Boolean = {
    val c = SQLOrderingUtil.compareDoubles(sa, sb)
    if (c != 0) c < 0 else idCmp(ia, ib) > 0
  }

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  def insert(s: Double, id: Any): Unit = {
    if (n < k) {
      var i = n
      scores(i) = s
      ids(i) = id
      n += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2)
        i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s
      ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var w = i
        if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true
        else { swap(i, w); i = w }
      }
    }
  }

  def foreach(f: (Double, Any) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }

  /** Entries ranked best-first: score desc, id asc. */
  def sortedBestFirst: Array[(Double, Any)] =
    (0 until n).map(i => (scores(i), ids(i))).sortWith { case ((sa, ia), (sb, ib)) =>
      worse(sb, ib, sa, ia)
    }.toArray
}

object TopKHeap {
  def idComparator(dt: DataType): (Any, Any) => Int = dt match {
    case LongType => (a, b) =>
      java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
    case IntegerType => (a, b) =>
      java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
    case StringType => (a, b) =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
    case other =>
      throw new IllegalArgumentException(s"topk_by_score: unsupported id type $other")
  }
}

object TopKAggregate {
  /** `topKByScore(score, id, k)` — aggregate to the group's top-k
    * `(score, id)` entries as a best-first-sorted struct array, ranked
    * (score desc, id asc). Bounded partial state: use instead of a
    * `row_number` window whenever a group's candidate count scales with
    * the data.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKByScore(GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
