package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.PartitionDirectory
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-file identity the plan-handoff maps (byte lengths, skip stats)
  * key on: the file's table-relative path with the retained-trash segment
  * stripped. File NAMES are not table-unique on partitioned layouts — one
  * partitionBy write emits `part-00000-<uuid>.parquet` into EVERY `k=v/`
  * dir its task touched — so a name-keyed map silently assigns one
  * partition's byte length to another's file, and a parquet scan bounded
  * by a too-small length reads ZERO row groups without erroring (row
  * groups are planned by midpoint-in-[0, length)). Live and trash-retained
  * copies of a file share the key, which is what lets time-travel reads
  * resolve descriptors for trash-revived files.
  */
private[sources] object GraftPathKey {
  def of(tableRoot: String, p: org.apache.hadoop.fs.Path): String = {
    val rootAbs = new org.apache.hadoop.fs.Path(tableRoot)
      .toUri.getPath.stripSuffix("/")
    val trashAbs = rootAbs + "/_graft_trash"
    val abs = p.toUri.getPath
    if (abs.startsWith(trashAbs + "/")) abs.stripPrefix(trashAbs + "/")
    else if (abs.startsWith(rootAbs + "/")) abs.stripPrefix(rootAbs + "/")
    else p.getName // foreign path — the name is the best identity left
  }
}

/** Manifest-stats FILE SKIPPING for the SQL read path: the catalog threads
  * each served snapshot's per-file [min, max] key stats into its file
  * index, and `listFiles` drops every file whose stats cannot overlap the
  * scan's pushed data filters — so `SELECT ... WHERE key BETWEEN lo AND hi`
  * PLANS only the overlapping files, the same skipping
  * [[graft.ops.Manifest.scanRange]] gives the Scala path (and what
  * Delta/Iceberg do at plan time). Without it the index serves every
  * snapshot file and only parquet row-group stats save the day — fine at
  * spec scale, a full-listing plan at 100 TB.
  *
  * Conservative by construction — pruning must NEVER lose a row:
  *   - conjuncts of the supported shapes prune (=, <, <=, >, >=, IN, AND;
  *     attribute-vs-literal either side); an OR prunes only when BOTH
  *     disjuncts translate (a file survives if EITHER side can overlap);
  *     anything else contributes no constraint;
  *   - integral/date/timestamp columns prune on normalized-long bounds
  *     (the catalyst literal's internal value IS the normalized long:
  *     micros for timestamps, days for dates, matching the snapshot's own
  *     normalization); STRING columns prune on the snapshot's string
  *     min/max in binary UTF-8 order (UTF8String comparison — the same
  *     order Spark's min/max aggregates produced the bounds in);
  *   - a column the snapshot carries no stats for never prunes; a file
  *     whose stats are NULL for a covered column holds NO non-null values
  *     there, and NULL never satisfies a comparison — prunable exactly
  *     like [[graft.ops.Manifest.scanBox]] treats it;
  *   - `=`/`IN` conjuncts on BLOOM-profiled columns additionally probe the
  *     per-file sketches (through the catalog-supplied `bloomProbe`, a
  *     file-count-sized distributed job run once per (column, values) and
  *     cached) — the SQL analogue of [[graft.ops.Manifest.scanKeys]] /
  *     `scanKeysString`: string probes hash with the same `xxhash64` the
  *     sketch was built over, so false negatives are impossible.
  *
  * The DV read rewrite keeps the same index, so merge-on-read SQL scans
  * skip files identically (`FileSourceScanExec` passes the pushed data
  * filters to `listFiles` on the V1 path too).
  */
private[sources] object GraftStatsSkip {

  /** Per-file, per-column skipping bounds. None = no non-null values. */
  sealed trait Bound
  final case class LongBounds(mn: Option[Long], mx: Option[Long]) extends Bound
  final case class StrBounds(mn: Option[String], mx: Option[String]) extends Bound

  /** file key ([[GraftPathKey]]) → stats column → bounds. */
  type FileStats = Map[String, Map[String, Bound]]

  /** Probe the per-file bloom sketches of `column` for `values` (already in
    * the sketch's long domain: normalized longs for orderable keys,
    * xxhash64 for strings). Some(keys) = the file keys that MIGHT contain
    * a value (safe to drop the rest); None = the column carries no sketch.
    */
  type BloomProbe = (String, Seq[Long]) => Option[Set[String]]

  private def statType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType => true
    case _ => false
  }

  private def litLong(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case s: java.lang.Short => Some(s.longValue)
    case b: java.lang.Byte => Some(b.longValue)
    case _ => None
  }

  private def litStr(v: Any): Option[String] = v match {
    case s: UTF8String => Some(s.toString)
    case s: String => Some(s)
    case _ => None
  }

  /** Binary UTF-8 comparison — the order string min/max aggregates use. */
  private def cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  private sealed trait C { def col: String }
  private final case class Eq(col: String, v: Long) extends C
  private final case class Gt(col: String, v: Long) extends C
  private final case class Ge(col: String, v: Long) extends C
  private final case class Lt(col: String, v: Long) extends C
  private final case class Le(col: String, v: Long) extends C
  private final case class InSet(col: String, vs: Seq[Long]) extends C
  private final case class SEq(col: String, v: String) extends C
  private final case class SGt(col: String, v: String) extends C
  private final case class SGe(col: String, v: String) extends C
  private final case class SLt(col: String, v: String) extends C
  private final case class SLe(col: String, v: String) extends C
  private final case class SInSet(col: String, vs: Seq[String]) extends C

  /** Constraint formula: a conjunction of leaves and OR nodes. */
  private sealed trait F
  private final case class CF(c: C) extends F
  private final case class OrF(l: Seq[F], r: Seq[F]) extends F

  private def comparison(a: AttributeReference, v: Any,
                         mk: Long => C, mkS: String => C): Seq[F] =
    if (statType(a.dataType)) litLong(v).map(l => CF(mk(l))).toSeq
    else if (a.dataType == StringType) litStr(v).map(s => CF(mkS(s))).toSeq
    else Nil

  /** Translate one pushed conjunct into a constraint formula — Nil for any
    * shape outside the supported set (no pruning, never wrong).
    */
  private def constraintsOf(e: Expression): Seq[F] = e match {
    case And(l, r) => constraintsOf(l) ++ constraintsOf(r)
    // An OR constrains only when BOTH sides do — a side with no
    // translation could match anything, so the OR prunes nothing.
    case Or(l, r) =>
      val (lf, rf) = (constraintsOf(l), constraintsOf(r))
      if (lf.isEmpty || rf.isEmpty) Nil else Seq(OrF(lf, rf))
    case EqualTo(a: AttributeReference, Literal(v, _)) =>
      comparison(a, v, Eq(a.name, _), SEq(a.name, _))
    case EqualTo(Literal(v, _), a: AttributeReference) =>
      comparison(a, v, Eq(a.name, _), SEq(a.name, _))
    case GreaterThan(a: AttributeReference, Literal(v, _)) =>
      comparison(a, v, Gt(a.name, _), SGt(a.name, _))
    case GreaterThan(Literal(v, _), a: AttributeReference) =>
      comparison(a, v, Lt(a.name, _), SLt(a.name, _))
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      comparison(a, v, Ge(a.name, _), SGe(a.name, _))
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      comparison(a, v, Le(a.name, _), SLe(a.name, _))
    case LessThan(a: AttributeReference, Literal(v, _)) =>
      comparison(a, v, Lt(a.name, _), SLt(a.name, _))
    case LessThan(Literal(v, _), a: AttributeReference) =>
      comparison(a, v, Gt(a.name, _), SGt(a.name, _))
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      comparison(a, v, Le(a.name, _), SLe(a.name, _))
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      comparison(a, v, Ge(a.name, _), SGe(a.name, _))
    case In(a: AttributeReference, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      if (statType(a.dataType)) {
        val longs = vs.map { case Literal(v, _) => litLong(v) }
        if (longs.forall(_.isDefined)) Seq(CF(InSet(a.name, longs.map(_.get))))
        else Nil
      } else if (a.dataType == StringType) {
        val strs = vs.map { case Literal(v, _) => litStr(v) }
        if (strs.forall(_.isDefined)) Seq(CF(SInSet(a.name, strs.map(_.get))))
        else Nil
      } else Nil
    // The optimizer converts IN lists past inSetConversionThreshold
    // (default 10) into InSet — the COMMON keyed-lookup shape. Values are
    // catalyst-internal (already the normalized long domain for the
    // admitted types). Past the per-file probe cap, degrade to the set's
    // [min, max] envelope — still a sound overlap bound.
    case org.apache.spark.sql.catalyst.expressions.InSet(a: AttributeReference, hset)
        if hset.nonEmpty =>
      if (statType(a.dataType)) {
        val longs = hset.toSeq.map(litLong)
        if (!longs.forall(_.isDefined)) Nil
        else {
          val vs = longs.map(_.get)
          if (vs.size <= 1000) Seq(CF(InSet(a.name, vs)))
          else Seq(CF(Ge(a.name, vs.min)), CF(Le(a.name, vs.max)))
        }
      } else if (a.dataType == StringType) {
        val strs = hset.toSeq.map(litStr)
        if (!strs.forall(_.isDefined) || strs.size > 1000) Nil
        else Seq(CF(SInSet(a.name, strs.map(_.get))))
      } else Nil
    case _ => Nil
  }

  /** Can a file with these stats contain a row satisfying `c`? NULL
    * bounds = no non-null values, which no comparison matches. A TYPE
    * mismatch (long constraint over string bounds or vice versa) never
    * prunes — it means the scan's column and the stats disagree, and
    * conservatism wins.
    */
  private def overlaps(c: C, st: Map[String, Bound]): Boolean =
    st.get(c.col) match {
      case None => true // column not stats-covered — never prune on it
      case Some(LongBounds(mn, mx)) => c match {
        case Eq(_, v) => mn.exists(_ <= v) && mx.exists(_ >= v)
        case Gt(_, v) => mx.exists(_ > v)
        case Ge(_, v) => mx.exists(_ >= v)
        case Lt(_, v) => mn.exists(_ < v)
        case Le(_, v) => mn.exists(_ <= v)
        case InSet(_, vs) =>
          vs.exists(v => mn.exists(_ <= v) && mx.exists(_ >= v))
        case _ => true
      }
      case Some(StrBounds(mn, mx)) => c match {
        case SEq(_, v) => mn.exists(cmp(_, v) <= 0) && mx.exists(cmp(_, v) >= 0)
        case SGt(_, v) => mx.exists(cmp(_, v) > 0)
        case SGe(_, v) => mx.exists(cmp(_, v) >= 0)
        case SLt(_, v) => mn.exists(cmp(_, v) < 0)
        case SLe(_, v) => mn.exists(cmp(_, v) <= 0)
        case SInSet(_, vs) =>
          vs.exists(v => mn.exists(cmp(_, v) <= 0) && mx.exists(cmp(_, v) >= 0))
        case _ => true
      }
    }

  private def overlapsF(f: F, st: Map[String, Bound]): Boolean = f match {
    case CF(c) => overlaps(c, st)
    case OrF(l, r) => l.forall(overlapsF(_, st)) || r.forall(overlapsF(_, st))
  }

  /** The bloom probe longs of a TOP-LEVEL equality leaf — raw normalized
    * longs for orderable keys, `xxhash64` (seed 42, the `xxhash64`
    * function's default — what [[graft.ops.Manifest]] built the sketch
    * over) for strings. Leaves inside OR nodes never probe: a sketch miss
    * there only refutes ONE disjunct.
    */
  private def probeLongs(c: C): Option[(String, Seq[Long])] = c match {
    case Eq(col, v) => Some(col -> Seq(v))
    case InSet(col, vs) => Some(col -> vs)
    case SEq(col, v) => Some(col -> Seq(hash64(v)))
    case SInSet(col, vs) => Some(col -> vs.map(hash64))
    case _ => None
  }

  private def hash64(s: String): Long =
    new XxHash64(Seq(Literal(UTF8String.fromString(s), StringType)))
      .eval(null).asInstanceOf[Long]

  /** Drop files (and emptied partitions) whose stats cannot overlap the
    * conjunction of `dataFilters`, then drop min/max survivors whose bloom
    * sketches refute every top-level equality probe. Files the stats map
    * does not know keep (the unpruned posture, never a wrong answer).
    */
  def prune(dirs: Seq[PartitionDirectory], dataFilters: Seq[Expression],
            stats: FileStats,
            keyOf: org.apache.hadoop.fs.Path => String,
            bloomProbe: Option[BloomProbe] = None): Seq[PartitionDirectory] = {
    val cs = dataFilters.flatMap(constraintsOf)
    if (cs.isEmpty) return dirs
    // One sketch-probe job per equality column, over min/max survivors.
    val bloomKeep: Seq[Set[String]] = bloomProbe.toSeq.flatMap { probe =>
      cs.collect { case CF(c) => probeLongs(c) }.flatten
        .groupBy(_._1).map { case (col, vs) => col -> vs.flatMap(_._2).distinct }
        .flatMap { case (col, longs) => probe(col, longs) }
    }
    dirs.flatMap { pd =>
      val kept = pd.files.filter { f =>
        val key = keyOf(f.getPath)
        stats.get(key) match {
          case None => true // unknown to the snapshot maps — never prune
          case Some(st) => cs.forall(overlapsF(_, st)) &&
            bloomKeep.forall(_.contains(key))
        }
      }
      if (kept.isEmpty) None
      else if (kept.length == pd.files.length) Some(pd)
      else Some(pd.copy(files = kept))
    }
  }
}
