package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded binary max-heap over (score, id) keeping the k smallest by the
  * engine's result order (score asc NaN-last, id asc) — the worst kept
  * entry sits at the root for O(log k) eviction. Mutable on purpose: it is
  * the aggregation buffer of [[TopKByScore]]. */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // (s1, i1) orders strictly after (s2, i2)? Double.compare ranks NaN
  // greatest, matching the engine's NaN-last invariant (K4).
  @inline private def after(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 > i2)
  }

  def insert(s: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = s; ids(size) = id; size += 1
      var i = size - 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (after(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    } else if (k > 0 && after(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && after(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && after(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  /** Kept entries as index order sorted by (score asc NaN-last, id asc). */
  def sortedIndices: Array[Int] = {
    val idx = Array.range(0, size).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) => {
      val c = java.lang.Double.compare(scores(x), scores(y))
      if (c != 0) c else java.lang.Long.compare(ids(x), ids(y))
    })
    idx.map(_.intValue())
  }
}

/** `topk_by_score(score, id, k)` — bounded top-k as a declarative
  * aggregate: each map task keeps at most k (score, id) entries in a heap
  * and PARTIAL aggregation ships k rows per task per group instead of the
  * group's full candidate set, which is the difference between an ANN
  * batch shuffling `candidates` rows and shuffling `tasks * k` at 100 TB.
  * The rank-window formulation it replaces sorts every candidate of every
  * group through one exchange.
  *
  * Returns `array<struct<score, id>>` sorted by (score asc NaN-last,
  * id asc) — `posexplode` recovers (rank - 1, entry). Null scores/ids are
  * skipped (the window formulation ranked NULL dist first — an artifact,
  * not a contract; distances of present vectors are never null). */
/** Bounded binary heap over (score, term) keeping the k FIRST entries by
  * (score desc, term asc) — the ranking order of tf-idf style "best terms
  * per key" aggregations. Root = worst kept entry. The mutable buffer of
  * [[TopKTerms]], mirroring [[TopKHeap]]. */
final class TopKTermHeap(val k: Int) {
  val scores = new Array[Double](k)
  val terms = new Array[org.apache.spark.unsafe.types.UTF8String](k)
  var size = 0

  // (s1, t1) ranks strictly after (s2, t2) in (score desc, term asc)?
  @inline private def after(s1: Double, t1: org.apache.spark.unsafe.types.UTF8String,
      s2: Double, t2: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c < 0 || (c == 0 && t1.compareTo(t2) > 0)
  }

  def insert(s: Double, t: org.apache.spark.unsafe.types.UTF8String): Unit =
    if (size < k) {
      scores(size) = s; terms(size) = t; size += 1
      var i = size - 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (after(scores(i), terms(i), scores(p), terms(p))) { swap(i, p); i = p }
        else return
      }
    } else if (k > 0 && after(scores(0), terms(0), s, t)) {
      scores(0) = s; terms(0) = t
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && after(scores(l), terms(l), scores(m), terms(m))) m = l
        if (r < size && after(scores(r), terms(r), scores(m), terms(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val t = terms(a); terms(a) = terms(b); terms(b) = t
  }

  /** Kept entries as index order sorted by (score desc, term asc). */
  def sortedIndices: Array[Int] = {
    val idx = Array.range(0, size).map(Integer.valueOf)
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) => {
      val c = java.lang.Double.compare(scores(y), scores(x))
      if (c != 0) c else terms(x).compareTo(terms(y))
    })
    idx.map(_.intValue())
  }
}

/** `topk_terms(score, term, k)` — bounded "best k terms" as a declarative
  * aggregate by (score desc, term asc), the [[TopKByScore]] pattern for
  * string payloads (round 16, built for [[graft.operators.TextPipeline
  * .topTermsTfIdf]]): partial aggregation ships at most k entries per
  * group per task, so a per-doc top-k whose group rows are task-local
  * (exploded from one row) exchanges k slim structs per doc instead of
  * moving the whole per-(doc, term) frame through a rank window — the
  * difference between ~2x corpus bytes of shuffle and ~nothing. Returns
  * `array<struct<score, term>>` in rank order; null scores/terms skipped. */
case class TopKTerms(
    score: Expression,
    term: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKTermHeap] with ImplicitCastInputTypes {
  require(k > 0 && k <= (1 << 22), s"topk k out of range: $k")

  override def children: Seq[Expression] = Seq(score, term)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("term", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_terms"

  override def createAggregationBuffer(): TopKTermHeap = new TopKTermHeap(k)

  override def update(buffer: TopKTermHeap, input: InternalRow): TopKTermHeap = {
    val s = score.eval(input)
    val t = term.eval(input)
    if (s != null && t != null)
      // clone: the input UTF8String may point into a reused row buffer
      buffer.insert(s.asInstanceOf[Double],
        t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone())
    buffer
  }

  override def merge(buffer: TopKTermHeap, other: TopKTermHeap): TopKTermHeap = {
    var i = 0
    while (i < other.size) { buffer.insert(other.scores(i), other.terms(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKTermHeap): Any = {
    val idx = buffer.sortedIndices
    val out = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) {
      out(i) = new GenericInternalRow(
        Array[Any](buffer.scores(idx(i)), buffer.terms(idx(i))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKTermHeap): Array[Byte] = {
    val termBytes = (0 until buffer.size).map(i => buffer.terms(i).getBytes)
    val bb = ByteBuffer.allocate(8 +
      (0 until buffer.size).map(i => 12 + termBytes(i).length).sum)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i))
      bb.putInt(termBytes(i).length).put(termBytes(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKTermHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKTermHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // heap-array order preserved, like TopKByScore
    while (i < n) {
      heap.scores(i) = bb.getDouble()
      val len = bb.getInt()
      val tb = new Array[Byte](len); bb.get(tb)
      heap.terms(i) = org.apache.spark.unsafe.types.UTF8String.fromBytes(tb)
      i += 1
    }
    heap.size = n
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKTerms =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKTerms =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKTerms =
    copy(score = newChildren(0), term = newChildren(1))
}

case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] with ImplicitCastInputTypes {
  require(k > 0 && k <= (1 << 22), s"topk k out of range: $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buffer.insert(other.scores(i), other.ids(i)); i += 1 }
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val idx = buffer.sortedIndices
    val out = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) {
      out(i) = new GenericInternalRow(
        Array[Any](buffer.scores(idx(i)), buffer.ids(idx(i))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * buffer.size)
    bb.putInt(buffer.k).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putDouble(buffer.scores(i)).putLong(buffer.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // entries were dumped in heap-array order, so copying preserves the
    // heap invariant directly
    while (i < n) { heap.scores(i) = bb.getDouble(); heap.ids(i) = bb.getLong(); i += 1 }
    heap.size = n
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}
