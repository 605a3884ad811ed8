package graft.jobs.taar

/** TAAR editorial whitelist refresh, ported from
  * mozetl/taar/taar_update_whitelist.py:28-70. The HTTP fetch is a
  * driver-side side-input (SURVEY §2.1 S7) injected by the caller; the
  * parse/validate/guard logic is what carries semantics.
  */
object UpdateWhitelist {

  final class ShortWhitelistError(msg: String) extends RuntimeException(msg)

  /** One editorial row: Some(guid) when present and well-formed. */
  case class EditorialRow(guid: Option[String])

  /** taar_update_whitelist.py:46-49. */
  def validateRow(row: EditorialRow): Boolean =
    row.guid.exists(g => g.nonEmpty && g != "null")

  /** taar_update_whitelist.py:57-70: distinct valid GUIDs, sorted; guards
    * against a suspiciously short editorial list (<100) unless allowed.
    */
  def parseRows(rows: Seq[EditorialRow],
      allowShortGuidList: Boolean = false): Seq[String] = {
    val guids = rows.filter(validateRow).flatMap(_.guid).distinct.sorted
    if (!allowShortGuidList && guids.length < 100)
      throw new ShortWhitelistError(
        s"Only obtained ${guids.length} editorial reviewed addons.")
    guids
  }
}
