package graft.jobs.taar

/** AMO add-on database filtering (driver-side JSON transform), ported from
  * mozetl/taar/taar_amowhitelist.py:40-160. Pure Scala — the input is a
  * few-MB JSON side file (SURVEY §2.1 S8), not a Spark concern.
  *
  * The `now` parameter replaces the reference's implicit
  * datetime.today() so the age cutoff is test-stable.
  */
object AmoWhitelist {

  val MinRating = 3.0
  val MinAgeDays = 60L
  val PioneerGuid = "pioneer-opt-in@mozilla.org"

  /** Minimal add-on record shape consumed by the accumulators. */
  case class AmoAddon(
      guid: String,
      isFeatured: Boolean,
      currentVersionHasFiles: Boolean,
      currentVersionIsWebextension: Boolean,
      averageRating: Double,
      firstCreateDate: Option[java.time.LocalDate])

  /** FeaturedAccumulator (taar_amowhitelist.py:53-62). */
  def featured(addons: Seq[AmoAddon]): Seq[AmoAddon] =
    addons.filter(_.isFeatured)

  /** WhitelistAccumulator (taar_amowhitelist.py:65-99): webextensions with
    * files, rated ≥ minRating, created ≥ minAgeDays before `now`, Pioneer
    * excluded.
    */
  def whitelist(addons: Seq[AmoAddon], now: java.time.LocalDate,
      minRating: Double = MinRating,
      minAgeDays: Long = MinAgeDays): Seq[AmoAddon] = {
    val latestCreate = now.minusDays(minAgeDays)
    addons.filter { a =>
      a.guid != PioneerGuid &&
        a.currentVersionHasFiles &&
        a.currentVersionIsWebextension &&
        a.averageRating >= minRating &&
        a.firstCreateDate.exists(d => !d.isAfter(latestCreate))
    }
  }

  /** WhitelistFeaturedAccumulator (taar_amowhitelist.py:102-112). */
  def featuredWhitelist(addons: Seq[AmoAddon], now: java.time.LocalDate,
      minRating: Double = MinRating,
      minAgeDays: Long = MinAgeDays): Seq[AmoAddon] =
    whitelist(addons.filter(_.isFeatured), now, minRating, minAgeDays)

  /** AMOTransformer.transform (taar_amowhitelist.py:140-160): all three
    * outputs in one pass over the dump.
    */
  def transform(addons: Seq[AmoAddon], now: java.time.LocalDate)
      : Map[String, Seq[AmoAddon]] = Map(
    "whitelist" -> whitelist(addons, now),
    "featured" -> featured(addons),
    "featured_whitelist" -> featuredWhitelist(addons, now))
}
