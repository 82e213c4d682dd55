package org.apache.spark.sql.execution.streaming.checkpointing

import java.io.{EOFException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{FileAlreadyExistsException => NioExists, Files, Paths, StandardCopyOption, StandardOpenOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, Path, PathFilter}

import CheckpointFileManager.CancellableFSDataOutputStream

/** CheckpointFileManager over plain java.nio for LOCAL, run-to-completion
  * drain scratch (see [[graft.streaming.CdcStream]]): every bounded drain
  * tears its checkpoint down right after the stream stops, so the WAL and
  * state-store deltas need Hadoop's durability machinery for exactly
  * nothing — yet the default local path routes each of the ~6 tiny
  * metadata writes per microbatch (offset WAL, commit log, source log,
  * one state delta per store partition) through ChecksumFileSystem: a
  * .crc shadow file per write, stream wrappers, and FileSystem-cache
  * locking, measured at ~40 ms per log commit on tmpfs where the actual
  * fsync is free. This manager keeps the exact rename-based atomicity and
  * CAS contract of [[FileSystemBasedCheckpointFileManager]] (temp file +
  * atomic rename, exists-check before a non-overwrite rename) with none
  * of the wrapping.
  *
  * Scale posture: a LIVE query's checkpoint belongs on durable shared
  * storage under the default manager — [[graft.streaming.CdcStream.replicate]]
  * and any caller with a real checkpointLocation never see this class;
  * only the drain helpers opt in, per query, via
  * `spark.sql.streaming.checkpointFileManagerClass`.
  */
class GraftNioCheckpointFileManager(root: Path, conf: Configuration)
    extends CheckpointFileManager {

  private def nio(p: Path): java.nio.file.Path = Paths.get(p.toUri.getPath)
  private def hp(p: java.nio.file.Path): Path =
    new Path("file", null, p.toAbsolutePath.toString)

  override def createAtomic(path: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val dst = nio(path)
    Option(dst.getParent).foreach(Files.createDirectories(_))
    val tmp = dst.resolveSibling(s".${dst.getFileName}.${System.nanoTime()}.tmp")
    val out = Files.newOutputStream(tmp, StandardOpenOption.CREATE_NEW,
      StandardOpenOption.WRITE)
    new CancellableFSDataOutputStream(out) {
      @volatile private var terminated = false
      override def cancel(): Unit = if (!terminated) {
        terminated = true
        try out.close() finally { Files.deleteIfExists(tmp): Unit }
      }
      override def close(): Unit = synchronized {
        if (!terminated) {
          terminated = true
          out.close()
          // Same check-then-rename CAS the Hadoop-based manager performs:
          // a non-overwrite close must fail if the target already exists
          // (HDFSBackedMetadataLog's add() races resolve on this), and
          // POSIX rename(2) would otherwise replace silently.
          if (!overwriteIfPossible && Files.exists(dst)) {
            Files.deleteIfExists(tmp)
            throw new FileAlreadyExistsException(
              s"Failed to rename $tmp to $dst as destination already exists")
          }
          try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: NioExists =>
              Files.deleteIfExists(tmp)
              throw new FileAlreadyExistsException(
                s"Failed to rename $tmp to $dst as destination already exists")
          }
        }
      }
    }
  }

  override def open(path: Path): FSDataInputStream = {
    val ch = FileChannel.open(nio(path), StandardOpenOption.READ)
    new FSDataInputStream(new org.apache.hadoop.fs.BufferedFSInputStream(
      new NioFsInput(ch), 8192))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = nio(path)
    if (!Files.exists(dir)) throw new java.io.FileNotFoundException(dir.toString)
    val out = Array.newBuilder[FileStatus]
    val stream = Files.newDirectoryStream(dir)
    try {
      stream.forEach { f =>
        val p = hp(f)
        if (filter == null || filter.accept(p)) {
          val attrs = Files.readAttributes(f,
            classOf[java.nio.file.attribute.BasicFileAttributes])
          out += new FileStatus(attrs.size(), attrs.isDirectory, 1, 0,
            attrs.lastModifiedTime().toMillis, p)
        }
      }
    } finally stream.close()
    out.result()
  }

  override def mkdirs(path: Path): Unit = { Files.createDirectories(nio(path)): Unit }

  override def exists(path: Path): Boolean = Files.exists(nio(path))

  override def delete(path: Path): Unit = {
    def rm(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val s = Files.newDirectoryStream(p)
        try s.forEach(rm(_)) finally s.close()
      }
      Files.deleteIfExists(p): Unit
    }
    rm(nio(path))
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    val dir = nio(root)
    Files.createDirectories(dir)
    hp(dir)
  }
}

/** Seekable/PositionedReadable file-channel input for
  * [[GraftNioCheckpointFileManager.open]].
  */
private class NioFsInput(ch: FileChannel) extends org.apache.hadoop.fs.FSInputStream {
  override def read(): Int = {
    val b = ByteBuffer.allocate(1)
    if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
  }
  override def read(b: Array[Byte], off: Int, len: Int): Int =
    ch.read(ByteBuffer.wrap(b, off, len))
  override def available(): Int =
    math.max(0L, math.min(Int.MaxValue.toLong, ch.size() - ch.position())).toInt
  override def close(): Unit = ch.close()
  override def seek(pos: Long): Unit = { ch.position(pos): Unit }
  override def getPos: Long = ch.position()
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(position: Long, buffer: Array[Byte], offset: Int,
      length: Int): Int =
    ch.read(ByteBuffer.wrap(buffer, offset, length), position)
}
