package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.PartitionDirectory
import org.apache.spark.sql.types._

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
  *   - only conjuncts of the supported shapes prune (=, <, <=, >, >=, IN,
  *     AND; attribute-vs-literal either side); anything else contributes
  *     no constraint;
  *   - only columns of the stat-normalizable types participate (integral /
  *     date / timestamp — the catalyst literal's internal value IS the
  *     normalized long: micros for timestamps, days for dates, matching
  *     the snapshot's own normalization);
  *   - a column the snapshot carries no stats for never prunes; a file
  *     whose stats are NULL for a covered column holds NO non-null values
  *     there, and NULL never satisfies a comparison — prunable exactly
  *     like [[graft.ops.Manifest.scanBox]] treats it.
  *
  * The DV read rewrite keeps the same index, so merge-on-read SQL scans
  * skip files identically (`FileSourceScanExec` passes the pushed data
  * filters to `listFiles` on the V1 path too).
  */
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

private[sources] object GraftStatsSkip {

  /** file key → (stats column → (min, max) in the normalized long
    * domain; None bounds = the file has no non-null values there). The key
    * is the file's TRASH-STRIPPED TABLE-RELATIVE path ([[GraftPathKey]]) —
    * the bare name is NOT unique on partitioned tables (a partitionBy
    * write lands `part-00000-<uuid>` in EVERY partition dir its task
    * wrote), and a name-keyed map would hand one partition's stats (or
    * byte length) to another's file.
    */
  type FileStats = Map[String, Map[String, (Option[Long], Option[Long])]]

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

  private sealed trait C { def col: String }
  private final case class Eq(col: String, v: Long) extends C
  private final case class Gt(col: String, v: Long) extends C
  private final case class Ge(col: String, v: Long) extends C
  private final case class Lt(col: String, v: Long) extends C
  private final case class Le(col: String, v: Long) extends C
  private final case class InSet(col: String, vs: Seq[Long]) extends C

  /** Translate one pushed conjunct into stats constraints — Nil for any
    * shape outside the supported set (no pruning, never wrong).
    */
  private def constraintsOf(e: Expression): Seq[C] = e match {
    case And(l, r) => constraintsOf(l) ++ constraintsOf(r)
    case EqualTo(a: AttributeReference, Literal(v, _)) if statType(a.dataType) =>
      litLong(v).map(Eq(a.name, _)).toSeq
    case EqualTo(Literal(v, _), a: AttributeReference) if statType(a.dataType) =>
      litLong(v).map(Eq(a.name, _)).toSeq
    case GreaterThan(a: AttributeReference, Literal(v, _)) if statType(a.dataType) =>
      litLong(v).map(Gt(a.name, _)).toSeq
    case GreaterThan(Literal(v, _), a: AttributeReference) if statType(a.dataType) =>
      litLong(v).map(Lt(a.name, _)).toSeq
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) if statType(a.dataType) =>
      litLong(v).map(Ge(a.name, _)).toSeq
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) if statType(a.dataType) =>
      litLong(v).map(Le(a.name, _)).toSeq
    case LessThan(a: AttributeReference, Literal(v, _)) if statType(a.dataType) =>
      litLong(v).map(Lt(a.name, _)).toSeq
    case LessThan(Literal(v, _), a: AttributeReference) if statType(a.dataType) =>
      litLong(v).map(Gt(a.name, _)).toSeq
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) if statType(a.dataType) =>
      litLong(v).map(Le(a.name, _)).toSeq
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) if statType(a.dataType) =>
      litLong(v).map(Ge(a.name, _)).toSeq
    case In(a: AttributeReference, vs) if statType(a.dataType) &&
        vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      val longs = vs.map { case Literal(v, _) => litLong(v) }
      if (longs.forall(_.isDefined)) Seq(InSet(a.name, longs.map(_.get)))
      else Nil
    // The optimizer converts IN lists past inSetConversionThreshold
    // (default 10) into InSet — the COMMON keyed-lookup shape. Values are
    // catalyst-internal (already the normalized long domain for the
    // admitted types). Past the per-file probe cap, degrade to the set's
    // [min, max] envelope — still a sound overlap bound.
    case org.apache.spark.sql.catalyst.expressions.InSet(a: AttributeReference, hset)
        if statType(a.dataType) && hset.nonEmpty =>
      val longs = hset.toSeq.map(litLong)
      if (!longs.forall(_.isDefined)) Nil
      else {
        val vs = longs.map(_.get)
        if (vs.size <= 1000) Seq(InSet(a.name, vs))
        else Seq(Ge(a.name, vs.min), Le(a.name, vs.max))
      }
    case _ => Nil
  }

  /** Can a file with these stats contain a row satisfying `c`? NULL
    * bounds = no non-null values, which no comparison matches.
    */
  private def overlaps(c: C, st: Map[String, (Option[Long], Option[Long])]): Boolean =
    st.get(c.col) match {
      case None => true // column not stats-covered — never prune on it
      case Some((mn, mx)) => c match {
        case Eq(_, v) => mn.exists(_ <= v) && mx.exists(_ >= v)
        case Gt(_, v) => mx.exists(_ > v)
        case Ge(_, v) => mx.exists(_ >= v)
        case Lt(_, v) => mn.exists(_ < v)
        case Le(_, v) => mn.exists(_ <= v)
        case InSet(_, vs) =>
          vs.exists(v => mn.exists(_ <= v) && mx.exists(_ >= v))
      }
    }

  /** Drop files (and emptied partitions) whose stats cannot overlap the
    * conjunction of `dataFilters`. Files the stats map does not know keep
    * (the unpruned posture, never a wrong answer).
    */
  def prune(dirs: Seq[PartitionDirectory], dataFilters: Seq[Expression],
            stats: FileStats,
            keyOf: org.apache.hadoop.fs.Path => String): Seq[PartitionDirectory] = {
    val cs = dataFilters.flatMap(constraintsOf)
    if (cs.isEmpty) return dirs
    dirs.flatMap { pd =>
      val kept = pd.files.filter { f =>
        stats.get(keyOf(f.getPath))
          .forall(st => cs.forall(overlaps(_, st)))
      }
      if (kept.isEmpty) None
      else if (kept.length == pd.files.length) Some(pd)
      else Some(pd.copy(files = kept))
    }
  }
}
