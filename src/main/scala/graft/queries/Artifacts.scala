package graft.queries

/** Key/path/eviction plumbing for [[Stage.persisted]] — the on-disk
  * fitted-artifact store.
  *
  * Path layout: `<root>/<sf-basename>/<name>-<fp16>/` where `fp16` is
  * 16 hex chars of MD5 over (code epoch, every input parquet's name and
  * bytes, every value-affecting GRAFT_* env knob). The fingerprint is
  * computed once per (JVM, sf dir): the fixture tables are ≤ tens of MB
  * locally, and at cluster scale the analogous key would be the lake
  * snapshot id — content-addressing is the honest recompute-on-change
  * contract either way (mtime-keying would miss a byte-identical
  * regeneration AND trust a touched-but-unchanged file).
  *
  * Harness knobs (GRAFT_WARMUP_* / GRAFT_BENCH_* / GRAFT_VERIFY_* /
  * GRAFT_ARTIFACT_*) are excluded from the knob hash — they change
  * scheduling, never values. Everything else under GRAFT_ is in.
  *
  * Eviction keeps ONE key per stage name per sf (the current one):
  * stale knob/epoch/data keys are deleted before a rebuild writes. */
object Artifacts {

  /** Bump when a fit algorithm changes in a way the knob hash cannot
    * see — forces a clean rebuild of every persisted artifact. */
  private val Epoch = "r15a"

  private val NonValuePrefixes = Seq("GRAFT_WARMUP_", "GRAFT_BENCH_",
    "GRAFT_VERIFY_", "GRAFT_ARTIFACT_")

  def enabled: Boolean =
    !sys.env.get("GRAFT_ARTIFACT_CACHE").contains("0")

  /** Persist only recognized dataset roots (fixture convention:
    * basename `sf*`): spec tmp-fixtures churn unique content per run
    * and would accumulate junk keys. GRAFT_ARTIFACT_FORCE=1 lifts the
    * restriction. */
  def enabledFor(dir: String): Boolean = enabled &&
    (new java.io.File(dir).getName.startsWith("sf") ||
      sys.env.get("GRAFT_ARTIFACT_FORCE").contains("1"))

  def root: String =
    sys.env.getOrElse("GRAFT_ARTIFACT_DIR", "target/graft-artifacts")

  private val fpCache =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** 16-hex content fingerprint of an sf dir (memoized per JVM). */
  def fingerprint(dir: String): String = fpCache.getOrElseUpdate(dir, {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(Epoch.getBytes("UTF-8"))
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array())
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    files.foreach { f =>
      md.update(f.getName.getBytes("UTF-8"))
      md.update(java.nio.file.Files.readAllBytes(f.toPath))
    }
    sys.env.toSeq
      .filter { case (k, _) => k.startsWith("GRAFT_") &&
        !NonValuePrefixes.exists(k.startsWith) }
      .sortBy(_._1)
      .foreach { case (k, v) => md.update(s"$k=$v;".getBytes("UTF-8")) }
    md.digest().map("%02x".format(_)).mkString.take(16)
  })

  /** Filesystem-safe stage name; a changed name gets a raw-name hash
    * suffix so two names never sanitize onto the same key. */
  private def safeName(name: String): String = {
    val s = name.replaceAll("[^A-Za-z0-9._-]", "_")
    if (s == name) s
    else {
      val md = java.security.MessageDigest.getInstance("MD5")
      s + "." + md.digest(name.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
    }
  }

  def path(dir: String, name: String): String = {
    val sf = new java.io.File(dir).getName
    s"$root/$sf/${safeName(name)}-${fingerprint(dir)}"
  }

  /** Delete stale keys of `name` under this sf (different fingerprint
    * only — the current key is about to be written). */
  def evictSiblings(dir: String, name: String): Unit = {
    val sf = new java.io.File(dir).getName
    val sn = safeName(name)
    val cur = s"$sn-${fingerprint(dir)}"
    val d = new java.io.File(s"$root/$sf")
    Option(d.listFiles()).getOrElse(Array())
      .filter(f => f.getName.startsWith(s"$sn-") && f.getName != cur
        // guard against prefix-sharing stage names (nnd vs nnd_incr):
        // the suffix after the last '-' must be exactly the fp16 shape
        && f.getName.stripPrefix(s"$sn-").matches("[0-9a-f]{16}"))
      .foreach(deleteRec)
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array()).foreach(deleteRec)
    f.delete(); ()
  }

  // ---- text artifacts (driver-side fitted OBJECTS — PCA components,
  // classifier weights — serialized by their own exact codecs) ----

  private val textLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Store/load a serialized model object under the same key scheme as
    * the parquet artifacts (`<name>-<fp16>.txt`, atomic tmp+rename,
    * stale keys evicted). Returns the STORED text on hit and miss
    * alike, so callers always deserialize the same bytes both rounds.
    * Caller guards [[enabledFor]]. */
  def persistedText(dir: String, name: String)(build: => String)
      : String = {
    val p = java.nio.file.Paths.get(path(dir, name) + ".txt")
    val lock = textLocks.computeIfAbsent(p.toString, _ => new Object)
    lock.synchronized {
      if (java.nio.file.Files.isRegularFile(p)) {
        noteHit(name)
        new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      } else {
        evictTextSiblings(dir, name)
        noteBuild(name)
        val text = build
        java.nio.file.Files.createDirectories(p.getParent)
        val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
        java.nio.file.Files.write(tmp, text.getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, p,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        text
      }
    }
  }

  private def evictTextSiblings(dir: String, name: String): Unit = {
    val sf = new java.io.File(dir).getName
    val sn = safeName(name)
    val cur = s"$sn-${fingerprint(dir)}.txt"
    val d = new java.io.File(s"$root/$sf")
    Option(d.listFiles()).getOrElse(Array())
      .filter(f => f.getName.startsWith(s"$sn-") && f.getName != cur
        && f.getName.stripPrefix(s"$sn-").matches("[0-9a-f]{16}\\.txt"))
      .foreach(_.delete())
  }

  // ---- per-run hit/build ledger (reported by Bench so a reader can
  // tell a warm-cache warmup from a cold rebuild at a glance) ----
  private val hits = scala.collection.concurrent.TrieMap.empty[String, Unit]
  private val builds = scala.collection.concurrent.TrieMap.empty[String, Unit]
  private[queries] def noteHit(name: String): Unit = hits.put(name, ())
  private[queries] def noteBuild(name: String): Unit = builds.put(name, ())
  def hitNames: Seq[String] = hits.keys.toSeq.sorted
  def buildNames: Seq[String] = builds.keys.toSeq.sorted
  def resetLedger(): Unit = { hits.clear(); builds.clear() }
}
