package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.checkpointing.GraftNioCheckpointFileManager
import org.scalatest.funsuite.AnyFunSuite

/** Internals pinned by this round's optimizations: the nio checkpoint
  * manager's atomicity/CAS contract (drain scratch WAL + state deltas
  * ride on it) and SignPackWord's Spark-SQL NaN comparison parity.
  */
class DrainInternalsSpec extends AnyFunSuite {

  private def mgr(root: java.nio.file.Path) =
    new GraftNioCheckpointFileManager(
      new Path("file", null, root.toString), new Configuration(false))

  test("nio checkpoint manager: atomic create, CAS on existing, list/open/delete") {
    val root = java.nio.file.Files.createTempDirectory("graft-cfm-spec-")
    val m = mgr(root)
    val dir = new Path("file", null, s"$root/offsets")
    m.mkdirs(dir)
    assert(m.exists(dir))

    // createAtomic + close: content lands atomically under the final name,
    // no temp residue.
    val f0 = new Path("file", null, s"$root/offsets/0")
    val out = m.createAtomic(f0, overwriteIfPossible = false)
    out.write("v1:batch0".getBytes("UTF-8")); out.close()
    assert(m.exists(f0))
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(s"$root/offsets"))
      .count() === 1, "no temp-file residue after close")

    // CAS: a second non-overwrite writer of the same batch file must fail
    // at close (HDFSBackedMetadataLog's add() race contract) and leave the
    // winner's content intact.
    val loser = m.createAtomic(f0, overwriteIfPossible = false)
    loser.write("v2:imposter".getBytes("UTF-8"))
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException](loser.close())
    // Overwrite mode replaces (state-store delta rewrite path).
    val ow = m.createAtomic(f0, overwriteIfPossible = true)
    ow.write("v3:rewrite".getBytes("UTF-8")); ow.close()

    // open(): seekable read returns the last atomic content.
    val in = m.open(f0)
    val buf = new Array[Byte](64)
    val n = in.read(buf)
    in.close()
    assert(new String(buf, 0, n, "UTF-8") === "v3:rewrite")

    // cancel(): no file, no residue.
    val c = m.createAtomic(new Path("file", null, s"$root/offsets/1"), false)
    c.write("x".getBytes("UTF-8")); c.cancel()
    assert(!m.exists(new Path("file", null, s"$root/offsets/1")))

    // list + filter (BatchFilesFilter-style name parsing relies on it).
    val listed = m.list(dir, null).map(_.getPath.getName).toSet
    assert(listed === Set("0"))

    // delete(): recursive, silent on missing.
    m.delete(dir)
    assert(!m.exists(dir))
    m.delete(dir) // no-throw
    m.delete(new Path("file", null, root.toString))
  }

  test("SignPackWord treats NaN as > 0, like the Spark SQL when-chain") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    val arr = ArrayData.toArrayData(Array(Float.NaN, -1f, 2f, 0f))
    val packed = graft.functions.SignPackWord.pack(arr, 0)
    // bit 0: NaN (> 0 in Spark SQL ordering) set; bit 1: -1 clear;
    // bit 2: 2 set; bit 3: 0 clear; bits past the array end clear.
    assert(packed === ((1L << 0) | (1L << 2)))
  }
}
