package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable-or-session lifecycle shared by every materialized derived-state
  * frame in the engine (verified dedup pair frames, simhash collision
  * pairs, contamination pairs, converged cluster labels): without
  * `SPARK_GRAFT_DEDUP_DIR` the frame is materialized under a session
  * scratch root (deleted at JVM exit); with it, materialized once under
  * `root/corpusKey#tag` and REUSED by later sessions without rebuilding —
  * on a real cluster that root belongs in the lake next to the corpus,
  * like any index. `tag` must encode every constant the frame depends on;
  * the key itself carries the corpus PATH plus a file-metadata staleness
  * fingerprint (see `fingerprint`), so a corpus regenerated in place
  * rebuilds its frames instead of serving stale ones.
  *
  * Materializing to parquet (rather than holding the build plan as a
  * cached frame) is load-bearing: a cached frame's lineage still
  * references every shuffle dependency of the build, which pins tens of
  * GB of dead candidate/banding shuffle files against the ContextCleaner
  * for the rest of the session — at the 5M-doc corpus that residue
  * OOM-killed the next pair build. The parquet read-back starts a fresh
  * lineage, so the build's scratch (caches AND shuffle files) is
  * collectable the moment the write commits.
  *
  * Concurrency: the path memo is keyed by (resolved root, corpus, tag) —
  * changing the root override or env mid-session can never serve frames
  * from the old root — and each first-build runs under a PER-KEY lock
  * OUTSIDE any ConcurrentHashMap compute lambda, so concurrent builds of
  * different tags never serialize behind a bin lock and a reentrant
  * build (a build whose body materializes another frame) cannot
  * deadlock the map.
  */
private[graft] object DerivedState {
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Build-scoped cache registry: while a materialization's build plan is
    * being written, frames registered through [[buildTracked]] land in a
    * registry scoped to THAT build and are blocking-unpersisted the moment
    * its write commits — build scratch registered by a concurrent build or
    * by direct callers (plan audits, probes) is never touched.
    */
  private val scratch = new ThreadLocal[CacheRegistry]

  /** Test seam mirroring the old Dedup override. */
  private[graft] var rootOverride: Option[String] = None

  /** Per-session corpus staleness fingerprint, memoized per dir: an MD5
    * over the corpus's file METADATA (relative path, byte length, mtime
    * millis, walked in sorted order) — one directory listing at first
    * touch per session, no Spark job. Folded into both the path memo key
    * and the on-disk frame name so a corpus REGENERATED IN PLACE (same
    * path, new data) can never be served another corpus's token/pair/label
    * frames: the fingerprint changes, the old frame dir simply stops
    * matching, and the frame rebuilds — closing the footgun the
    * path-keyed contract left to callers. A byte-identical-length rewrite
    * inside one mtime tick is the only blind spot (regeneration changes
    * content sizes and timestamps in practice); false rebuilds (e.g. a
    * copied corpus with fresh mtimes) cost a rebuild, never wrong rows.
    */
  private val fps = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private[graft] def fingerprint(dir: String): String =
    fps.computeIfAbsent(dir, { d =>
      val root = new java.io.File(d)
      val md = java.security.MessageDigest.getInstance("MD5")
      def walk(f: java.io.File): Unit =
        Option(f.listFiles()).map(_.sortBy(_.getName)).getOrElse(Array.empty)
          .foreach { k =>
            if (k.isDirectory) walk(k)
            else md.update(
              s"${k.getPath.drop(root.getPath.length)}#${k.length}#${k.lastModified}\n"
                .getBytes("UTF-8"))
          }
      walk(root)
      md.digest().take(6).map("%02x".format(_)).mkString
    })

  private lazy val sessionRoot: String = {
    val t = java.nio.file.Files.createTempDirectory("graft-derived-").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(t)
    }))
    t.getPath
  }

  private def resolvedRoot: String =
    rootOverride.orElse(sys.env.get("SPARK_GRAFT_DEDUP_DIR")).getOrElse(sessionRoot)

  /** Register `df` as scratch of the currently-running build (released
    * when that build's write commits); outside any build, register into
    * the caller's long-lived `fallback` registry.
    */
  def buildTracked(fallback: CacheRegistry)(df: DataFrame): DataFrame =
    Option(scratch.get).getOrElse(fallback).tracked(df)

  /** Forget session-memoized paths AND corpus fingerprints (simulates a
    * fresh session against the same durable root).
    */
  def reset(): Unit = { dirs.clear(); fps.clear() }

  /** After a successful (re)build, delete sibling frame dirs for the SAME
    * (corpus, tag) under a DIFFERENT fingerprint: the key embeds the
    * fingerprint, so they can never be read again, and each in-place
    * corpus regeneration would otherwise leak one dead frame dir in the
    * durable root forever. Matching is exact-shape — `ck#<12-hex>#tag` —
    * so other corpora's and other tags' frames (including tags that are
    * suffixes of each other: the middle segment must be pure fingerprint
    * hex) are never touched. Runs under the build's per-key lock; a
    * concurrent session still reading an old-fingerprint frame implies
    * the corpus changed under IT — already incorrect, not made worse.
    */
  private def gcStale(root: java.io.File, ck: String, fp: String,
      tag: String): Unit = {
    val pfx = s"$ck#"
    val sfx = s"#$tag"
    Option(root.listFiles()).getOrElse(Array.empty[java.io.File]).foreach { f =>
      val n = f.getName
      if (f.isDirectory && n.startsWith(pfx) && n.endsWith(sfx) &&
          n.length > pfx.length + sfx.length &&
          n != s"$ck#$fp$sfx" &&
          n.substring(pfx.length, n.length - sfx.length).matches("[0-9a-f]{12}")) {
        def rm(g: java.io.File): Unit = {
          Option(g.listFiles()).foreach(_.foreach(rm)); g.delete(): Unit
        }
        rm(f)
      }
    }
  }

  /** The materialized frame for (corpus `dir`, `tag`), building it with
    * `build` exactly once per (root, dir, tag) per session if no durable
    * copy exists. Returns an UN-cached parquet read — callers wrap it in
    * their own registry's tracked() if they want it warm.
    */
  def materialized(spark: SparkSession, dir: String, tag: String)(
      build: => DataFrame): DataFrame = {
    val root = resolvedRoot
    val fp = fingerprint(dir)
    val key = s"$root#$dir#$fp#$tag"
    val path = Option(dirs.get(key)).getOrElse {
      val lock = locks.computeIfAbsent(key, _ => new Object)
      lock.synchronized {
        Option(dirs.get(key)).getOrElse {
          val ck = Tables.corpusKey(dir)
          val d = new java.io.File(root, s"$ck#$fp#$tag")
          if (!new java.io.File(d, "_SUCCESS").isFile) {
            val reg = new CacheRegistry
            val prev = scratch.get
            scratch.set(reg)
            try build.write.mode("overwrite").parquet(d.getPath)
            finally {
              if (prev == null) scratch.remove() else scratch.set(prev)
              reg.clear()
            }
            gcStale(new java.io.File(root), ck, fp, tag)
          }
          dirs.put(key, d.getPath)
          d.getPath
        }
      }
    }
    spark.read.parquet(path)
  }
}
