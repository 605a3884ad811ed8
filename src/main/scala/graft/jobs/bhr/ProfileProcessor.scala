package graft.jobs.bhr

import scala.collection.mutable

/** Driver-side profile assembly for the BHR collection job, ported from
  * mozetl/bhr_collection/bhr_collection.py:43-456 (UniqueKeyedTable /
  * GrowToFitList / ProfileProcessor). This is the product of the
  * reference's largest job: it interns hang pseudo-stacks into
  * struct-of-array tables (the profiler's processed-profile format) and
  * tracks per-build-date hang samples against a prune cache so rare
  * stack suffixes collapse into "(other)".
  *
  * Deliberately plain Scala on the driver: the input is the SMALL
  * aggregated output of `BhrCollection.aggregateHangs` (one row per
  * distinct stack × thread × date), not raw pings — the reference does
  * exactly this (`profile_processor.ingest` consumes the collected
  * reduceByKey result, bhr_collection.py:1090-1099).
  */
object ProfileProcessor {

  /** One aggregated hang sample (the reference's 8-tuple row,
    * bhr_collection.py:285-295): stack frames are (funcName, libName)
    * pairs, annotations are (name, value) pairs.
    */
  case class SampleRow(
      stack: Seq[(String, String)],
      runnableName: String,
      threadName: String,
      buildDate: String,
      annotations: Seq[(String, String)],
      platform: String,
      hangMs: Double,
      hangCount: Double)

  case class Config(
      uuid: String,
      stackAcceptanceThreshold: Double = 0.0,
      useMinimalSampleTable: Boolean = false,
      postSampleSize: Double = 1.0)

  /** UniqueKeyedTable (bhr_collection.py:43-86): insertion-ordered
    * key→index interning with a default-from-key constructor.
    */
  final class InternTable[K, V](default: K => V) {
    private val indexOf = mutable.HashMap.empty[K, Int]
    val items: mutable.ArrayBuffer[V] = mutable.ArrayBuffer.empty

    def keyToIndex(key: K): Int = indexOf.getOrElseUpdate(key, {
      items += default(key)
      items.length - 1
    })
    def keyToItem(key: K): V = items(keyToIndex(key))
    def indexToItem(index: Int): V = items(index)
    def size: Int = items.length
  }

  // --- processed-profile output model (struct-of-arrays) ---------------

  case class Lib(name: String, offset: Int, path: String, debugName: String,
      debugPath: String, arch: String)
  case class FuncTable(name: Seq[Int], lib: Seq[Option[Int]], length: Int)
  case class StackTable(prefix: Seq[Option[Int]], func: Seq[Int], length: Int)
  case class AnnotationsTable(prefix: Seq[Option[Int]], name: Seq[Int],
      value: Seq[Int], length: Int)
  case class SampleTable(stack: Seq[Int], runnable: Seq[Int],
      annotations: Seq[Option[Int]], platform: Seq[Int], length: Int)
  case class DateEntry(date: String, sampleHangMs: Seq[Option[Double]],
      sampleHangCount: Seq[Option[Double]])
  case class ProcessedThread(
      name: String,
      processType: String,
      libs: Seq[Lib],
      funcTable: FuncTable,
      stackTable: StackTable,
      annotationsTable: AnnotationsTable,
      sampleTable: SampleTable,
      stringArray: Seq[String],
      dates: Seq[DateEntry])
  case class Profile(threads: Seq[ProcessedThread],
      usageHoursByDate: Map[String, Double], uuid: String)

  /** get_default_lib (bhr_collection.py:102-110). */
  def defaultLib(name: String): Lib =
    Lib(name.replaceAll("\\.pdb$", ""), 0, "", name, name, "")

  // --- per-thread mutable state (get_default_thread, :113-172) ----------

  private final class ThreadState(val name: String) {
    val strings = new InternTable[String, String](identity)
    val libs = new InternTable[String, Lib](defaultLib)
    // (stringIndex(name), Option(libIndex))
    val funcTable =
      new InternTable[(String, Option[String]), (Int, Option[Int])]({
        case (fn, lib) => (strings.keyToIndex(fn), lib.map(libs.keyToIndex))
      })
    // key: (funcName, libName, prefixIndex) → (prefix, funcIndex)
    val stackTable =
      new InternTable[(String, Option[String], Option[Int]), (Option[Int], Int)]({
        case (fn, lib, prefix) => (prefix, funcTable.keyToIndex((fn, lib)))
      })
    val annotationsTable =
      new InternTable[(Option[Int], String, String), (Option[Int], Int, Int)]({
        case (prefix, n, v) =>
          (prefix, strings.keyToIndex(n), strings.keyToIndex(v))
      })
    // key/value: (stackIndex, runnable, annotationIndex, platform)
    val sampleTable =
      new InternTable[(Int, String, Option[Int], String), (Int, Int, Option[Int], Int)]({
        case (stack, runnable, ann, platform) =>
          (stack, strings.keyToIndex(runnable), ann,
            strings.keyToIndex(platform))
      })
    var pruneStackCache =
      new InternTable[(String, Option[String], Option[Int]), Array[Double]](
        _ => Array(0.0))
    // per build date: grow-to-fit parallel arrays indexed by sample index
    val dates = new InternTable[String,
      (String, mutable.ArrayBuffer[Option[Double]], mutable.ArrayBuffer[Option[Double]])](
      d => (d, mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty))

    stackTable.keyToIndex(("(root)", None, None))
    pruneStackCache.keyToIndex(("(root)", None, None))

    def processType: String =
      if (name == "Gecko_Child" || name == "Gecko_Child_ForcePaint") "tab"
      else "default"
  }

  private def growSet(buf: mutable.ArrayBuffer[Option[Double]], i: Int,
      f: Double => Double): Unit = {
    while (buf.length <= i) buf += None
    buf(i) = Some(f(buf(i).getOrElse(0.0)))
  }
}

/** Stateful processor: `ingest` batches of aggregated rows (+ usage
  * hours), then `processIntoProfile` emits the final struct-of-arrays
  * profile. Sampling (`postSampleSize`) is injected as a deterministic
  * predicate so tests are stable (the reference uses
  * `random.random() <= sample_size`, bhr_collection.py:267).
  */
final class ProfileProcessor(config: ProfileProcessor.Config,
    sampleKeep: Int => Boolean = _ => true) {
  import ProfileProcessor._

  private val threads = new InternTable[String, ThreadState](
    new ThreadState(_))
  private var usageHoursByDate = Map.empty[String, Double]
  private var rowCounter = 0

  /** ingest (bhr_collection.py:365-385): zero-duration rows drop, then a
    * pre-pass accumulates the prune cache before the real ingest.
    */
  def ingest(data: Seq[SampleRow],
      usageHours: Map[String, Double] = Map.empty): Unit = {
    val rows = data.filter(_.hangMs > 0.0)
    rows.foreach(preIngestRow)
    rows.foreach { row =>
      rowCounter += 1
      if (config.postSampleSize >= 1.0 || sampleKeep(rowCounter))
        ingestRow(row)
    }
    usageHoursByDate = merge(usageHoursByDate, usageHours)
  }

  /** merge_number_dicts (bhr_collection.py:200-202). */
  private def merge(a: Map[String, Double],
      b: Map[String, Double]): Map[String, Double] =
    (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0.0) + b.getOrElse(k, 0.0))).toMap

  /** pre_ingest_row (bhr_collection.py:285-309): accumulate hang ms along
    * the stack path (including root) in the prune cache.
    */
  private def preIngestRow(row: SampleRow): Unit = {
    val thread = threads.keyToItem(row.threadName)
    val cache = thread.pruneStackCache
    cache.keyToItem(("(root)", None, None))(0) += row.hangMs
    var last = 0
    row.stack.foreach { case (fn, lib) =>
      last = cache.keyToIndex((fn, Option(lib), Some(last)))
      cache.indexToItem(last)(0) += row.hangMs
    }
  }

  /** ingest_row (bhr_collection.py:311-363): intern annotations, walk
    * the stack under the acceptance threshold (collapsing rare suffixes
    * into "(other)"), intern the sample, accumulate per-date totals.
    */
  private def ingestRow(row: SampleRow): Unit = {
    val thread = threads.keyToItem(row.threadName)
    val cache = thread.pruneStackCache

    var lastAnnotation: Option[Int] = None
    row.annotations.foreach { case (n, v) =>
      lastAnnotation =
        Some(thread.annotationsTable.keyToIndex((lastAnnotation, n, v)))
    }

    var lastStack = 0
    var lastCacheIndex = 0
    var broke = false
    val it = row.stack.iterator
    while (it.hasNext && !broke) {
      val (fn, lib) = it.next()
      val cacheIndex = cache.keyToIndex((fn, Option(lib), Some(lastCacheIndex)))
      val item = cache.indexToItem(cacheIndex)(0)
      val parent = cache.indexToItem(lastCacheIndex)(0)
      if (item / parent > config.stackAcceptanceThreshold) {
        lastStack =
          thread.stackTable.keyToIndex((fn, Option(lib), Some(lastStack)))
        lastCacheIndex = cacheIndex
      } else {
        // below the acceptance threshold: lump under "(other)" and stop
        lastStack =
          thread.stackTable.keyToIndex(("(other)", Option(lib), Some(lastStack)))
        broke = true
      }
    }

    if (config.useMinimalSampleTable && row.threadName == "Gecko_Child") return

    val sampleIndex = thread.sampleTable.keyToIndex(
      (lastStack, row.runnableName, lastAnnotation, row.platform))
    val (_, ms, counts) = thread.dates.keyToItem(row.buildDate)
    growSet(counts, sampleIndex, _ + row.hangCount)
    growSet(ms, sampleIndex, _ + row.hangMs)
  }

  /** process_thread (bhr_collection.py:398-416). */
  private def processThread(t: ThreadState): ProcessedThread = ProcessedThread(
    name = t.name,
    processType = t.processType,
    libs = t.libs.items.toSeq,
    funcTable = FuncTable(
      t.funcTable.items.map(_._1).toSeq,
      t.funcTable.items.map(_._2).toSeq,
      t.funcTable.size),
    stackTable = StackTable(
      t.stackTable.items.map(_._1).toSeq,
      t.stackTable.items.map(_._2).toSeq,
      t.stackTable.size),
    annotationsTable = AnnotationsTable(
      t.annotationsTable.items.map(_._1).toSeq,
      t.annotationsTable.items.map(_._2).toSeq,
      t.annotationsTable.items.map(_._3).toSeq,
      t.annotationsTable.size),
    sampleTable = SampleTable(
      t.sampleTable.items.map(_._1).toSeq,
      t.sampleTable.items.map(_._2).toSeq,
      t.sampleTable.items.map(_._3).toSeq,
      t.sampleTable.items.map(_._4).toSeq,
      t.sampleTable.size),
    stringArray = t.strings.items.toSeq,
    dates = t.dates.items.map { case (d, ms, counts) =>
      // minimal sample table drops the ms series (process_date, :388-394)
      if (config.useMinimalSampleTable) DateEntry(d, Seq.empty, counts.toSeq)
      else DateEntry(d, ms.toSeq, counts.toSeq)
    }.toSeq)

  /** process_into_profile (bhr_collection.py:441-456, unsplit shape). */
  def processIntoProfile(): Profile = Profile(
    threads = threads.items.map(processThread).toSeq,
    usageHoursByDate = usageHoursByDate,
    uuid = config.uuid)

  /** reconstruct_stack (bhr_collection.py:175-186): invert the interning
    * for verification — root-to-leaf (funcName, libDebugName) pairs.
    */
  def reconstructStack(threadName: String, stackIndex: Int)
      : Seq[(String, String)] = {
    val t = threads.keyToItem(threadName)
    var result = List.empty[(String, String)]
    var idx = stackIndex
    while (idx != 0) {
      val (prefix, funcIndex) = t.stackTable.indexToItem(idx)
      val (nameIdx, libIdx) = t.funcTable.indexToItem(funcIndex)
      val libName = libIdx.map(t.libs.indexToItem(_).debugName).orNull
      result = (t.strings.indexToItem(nameIdx), libName) :: result
      idx = prefix.getOrElse(0)
    }
    result
  }
}
