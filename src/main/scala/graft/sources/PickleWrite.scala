package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Dataset

/** S10 as a REAL pickle sink — the write side of the `.mwaspkl` interop
  * (read side: [[PickleCompat]] / [[MwasPickleSource]]): emits files the
  * reference's own loader (`main/mwas_general.py:132-148` — two
  * `pickle.load`s: the ref list, then the set DataFrame) and plain
  * `pandas.read_pickle` accept, so a graft user can hand condensed
  * corpora BACK to legacy tooling.
  *
  * Pickle is a VM, not a format: any opcode stream that CONSTRUCTS the
  * right object is a valid pickle of it. The writer does not mimic
  * pandas' internal BlockManager graph byte-for-byte (an
  * implementation detail that shifts across pandas versions); it emits
  * protocol-2 `REDUCE(pandas.core.frame.DataFrame, ({col: values…},))`
  * — the PUBLIC constructor, stable across every pandas that can read
  * the reference's data, column order preserved by dict insertion
  * order, dtypes (object/object/object/bool) matching the reference's
  * frames. Verified two ways: [[PickleCompat]] round-trips every write
  * (the VM interprets the constructor form), and `tools/picklecheck.py`
  * loads written files with REAL pandas and compares them cell-for-cell
  * against pandas' own reading of the reference-written fixtures.
  *
  * Sentinels follow `main/converter_.py:25-31`: a project with no sets
  * is the 1-byte `'0'` file; blacklist status writes `'1'`.
  */
object PickleWrite {

  // --------------------------------------------- protocol-2 opcode emitter

  private final class Emitter {
    val out = new ByteArrayOutputStream()
    def byte(b: Int): Unit = out.write(b)
    def raw(b: Array[Byte]): Unit = out.write(b)
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }

    def proto(): Unit = { byte(0x80); byte(2) }
    def stop(): Unit = byte('.')
    def mark(): Unit = byte('(')

    def global(module: String, name: String): Unit = {
      byte('c')
      raw(s"$module\n$name\n".getBytes(StandardCharsets.US_ASCII))
    }
    def reduce(): Unit = byte('R')
    def tuple(): Unit = byte('t') // pops to MARK
    def tuple1(): Unit = byte(0x85)

    def str(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      byte('X'); le32(b.length); raw(b) // BINUNICODE
    }
    def bool(v: Boolean): Unit = byte(if (v) 0x88 else 0x89)
    def int(v: Long): Unit = {
      if (v >= 0 && v < 256) { byte('K'); byte(v.toInt) } // BININT1
      else if (v >= 0 && v < 65536) { // BININT2
        byte('M'); byte((v & 0xff).toInt); byte(((v >> 8) & 0xff).toInt)
      } else if (v >= Int.MinValue && v <= Int.MaxValue) {
        byte('J'); le32(v.toInt) // BININT (signed LE32)
      } else { // LONG1, two's-complement LE
        var bytes = List.empty[Int]
        var x = v
        var done = false
        while (!done) {
          val b = (x & 0xff).toInt
          x >>= 8
          bytes ::= b
          // stop once remaining bits are pure sign-extension of the top byte
          if ((x == 0 && (b & 0x80) == 0) || (x == -1 && (b & 0x80) != 0))
            done = true
        }
        val arr = bytes.reverse.toArray
        byte(0x8a); byte(arr.length); arr.foreach(byte)
      }
    }

    /** list of pre-emitted elements: caller supplies an emit thunk per
      * element. EMPTY_LIST + MARK + elems + APPENDS. */
    def list(n: Int)(emitEach: Int => Unit): Unit = {
      byte(']')
      if (n > 0) {
        mark()
        (0 until n).foreach(emitEach)
        byte('e') // APPENDS
      }
    }

    /** dict with string keys. EMPTY_DICT + MARK + k v pairs + SETITEMS. */
    def dict(keys: Seq[String])(emitValue: Int => Unit): Unit = {
      byte('}')
      if (keys.nonEmpty) {
        mark()
        keys.zipWithIndex.foreach { case (k, i) => str(k); emitValue(i) }
        byte('u') // SETITEMS
      }
    }
  }

  // ------------------------------------------------------------- payloads

  /** The two back-to-back dumps of one `.mwaspkl`: `biosamples_ref`
    * (list[str]) then the set DataFrame. */
  def encodeProject(p: PickleCompat.ProjectPickle): Array[Byte] = {
    if (p.status == "blacklisted") return Array('1'.toByte)
    if (p.attributes.isEmpty) return Array('0'.toByte)

    val e = new Emitter
    // dump 1: the ref list
    e.proto()
    e.list(p.biosamples.size)(i => e.str(p.biosamples(i)))
    e.stop()
    // dump 2: DataFrame({attributes:…, values:…, biosample_index_list:…,
    //                    include?:…})
    e.proto()
    e.global("pandas.core.frame", "DataFrame")
    e.dict(Seq("attributes", "values", "biosample_index_list", "include?")) {
      case 0 => e.list(p.attributes.size)(i => e.str(p.attributes(i)))
      case 1 => e.list(p.values.size)(i => e.str(p.values(i)))
      case 2 => e.list(p.index_lists.size) { i =>
        val idx = p.index_lists(i)
        e.list(idx.size)(j => e.int(idx(j).toLong))
      }
      case 3 => e.list(p.includes.size)(i => e.bool(p.includes(i)))
    }
    e.tuple1() // (dict,)
    e.reduce() // DataFrame(dict)
    e.stop()
    e.out.toByteArray
  }

  /** Write one `.mwaspkl` per project under `outDir` (executor-parallel;
    * `outDir` must be a shared filesystem path, same contract as any
    * Spark sink). */
  def writeProjects(projects: Dataset[PickleCompat.ProjectPickle],
      outDir: String): Unit = {
    val dir = outDir
    projects.foreachPartition {
      (it: Iterator[PickleCompat.ProjectPickle]) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.foreach { p =>
          val path = new org.apache.hadoop.fs.Path(
            s"$dir/${p.bioproject}.mwaspkl")
          val fs = path.getFileSystem(conf)
          val out = fs.create(path, true)
          try out.write(encodeProject(p)) finally out.close()
        }
    }
  }
}
