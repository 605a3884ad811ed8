package graft.jobs.bhr

/** BHR ping → hang extraction, ported from
  * mozetl/bhr_collection/bhr_collection.py:593-717 as typed Scala (the
  * reference processes JSON dicts row-at-a-time in Python; here the ping
  * is a case-class model and extraction is pure functions usable inside
  * Dataset.flatMap).
  */
object HangExtraction {

  /** A raw stack frame: native frames are (moduleIndex, offset) pairs;
    * pseudo frames are bare labels (bhr_collection.py:620-628).
    */
  sealed trait RawFrame
  case class NativeFrame(moduleIndex: Int, offset: String) extends RawFrame
  case class PseudoFrame(label: String) extends RawFrame

  /** (debug_name, breakpad_id) module table entry. */
  case class Module(debugName: String, breakpadId: String)

  case class RawHang(stack: Seq[RawFrame], duration: Double, thread: String,
      process: String, annotations: Map[String, String])

  case class Ping(buildId: String, osName: String, modules: Seq[Module],
      hangs: Seq[RawHang])

  /** A processed frame: resolved module (or None) + offset/label. */
  case class Frame(module: Option[Module], offset: String)

  case class Config(threadFilter: String, maxStackLen: Int = 300)

  /** bhr_collection.py:620-628. */
  def processFrame(frame: RawFrame, modules: Seq[Module]): Frame =
    frame match {
      case NativeFrame(idx, offset) =>
        if (idx < 0 || idx >= modules.length) Frame(None, offset)
        else Frame(Some(modules(idx)), offset)
      case PseudoFrame(label) =>
        Frame(Some(Module("pseudo", null)), label)
    }

  /** bhr_collection.py:631-636. */
  def filterHang(hang: RawHang, config: Config): Boolean =
    hang.thread == config.threadFilter &&
      hang.stack.nonEmpty && hang.stack.length < config.maxStackLen

  /** bhr_collection.py:645-717: one ping → hang rows; ForcePaint hangs
    * (PaintWhileInterruptingJS annotation) are emitted a second time under
    * the synthetic Gecko_Child_ForcePaint thread, exactly like the
    * reference.
    */
  def processHangs(ping: Ping, config: Config): Seq[BhrCollection.Hang] = {
    val buildDate = ping.buildId.take(8)
    ping.hangs.filter(filterHang(_, config)).flatMap { h =>
      val frames = h.stack.map(f => processFrame(f, ping.modules))
      val stackStrings = frames.map { fr =>
        fr.module match {
          case Some(m) => s"${m.debugName}\\${m.breakpadId}:${fr.offset}"
          case None => s"?:${fr.offset}"
        }
      }
      val base = BhrCollection.Hang(stackStrings, h.duration, h.thread,
        "", h.process, buildDate, ping.osName,
        annotations = h.annotations.toSeq.sortBy(_._1))
      if (h.annotations.contains("PaintWhileInterruptingJS"))
        Seq(base, base.copy(thread = "Gecko_Child_ForcePaint"))
      else Seq(base)
    }
  }
}
