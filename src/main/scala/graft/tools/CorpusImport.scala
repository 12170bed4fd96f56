package graft.tools

import graft.oracle.FuzzyMatcher

/** Corpus import with the reference CLI's S1 semantics
  * (/root/reference/cli/src/FuzzyMatch-cli.cc:32-79):
  *
  *  - `src,tgt` comma pair → two parallel files read line-by-line;
  *  - otherwise a single file whose lines may be inline `src\ttgt`;
  *  - files ending in `.gz` are transparently gunzipped;
  *  - ids are 1-based line numbers; `addTarget` appends `=tgt` to the id;
  *    `addTargetNoIndex` uses the target alone as the id.
  */
object CorpusImport {

  /** Line iterator over a plain or gzipped UTF-8 text file. Closes the
    * stream when the iterator is exhausted; call `close()` early otherwise. */
  final class Lines(path: String) extends Iterator[String] with AutoCloseable {
    private val in: java.io.BufferedReader = {
      val fis = new java.io.FileInputStream(path)
      val stream =
        if (path.endsWith(".gz")) new java.util.zip.GZIPInputStream(fis) else fis
      new java.io.BufferedReader(
        new java.io.InputStreamReader(stream, java.nio.charset.StandardCharsets.UTF_8))
    }
    private var nextLine: String = in.readLine()
    override def hasNext: Boolean = nextLine != null
    override def next(): String = {
      val l = nextLine
      nextLine = in.readLine()
      if (nextLine == null) close()
      l
    }
    override def close(): Unit = in.close()
  }

  /** Stream (external id, source sentence) rows with the CLI's id
    * semantics to `f`, line by line — the S1 read core shared by the oracle
    * import (which must NOT buffer a multi-million-line TM on top of its
    * own index) and the collecting [[readRows]]. Returns the line count. */
  def eachRow(
      tmFile: String,
      addTarget: Boolean = false,
      addTargetNoIndex: Boolean = false)(f: (String, String) => Unit): Int = {
    val comma = tmFile.indexOf(',')
    val (srcPath, tgtPath) =
      if (comma >= 0) (tmFile.substring(0, comma), Some(tmFile.substring(comma + 1)))
      else (tmFile, None)
    val src = new Lines(srcPath)
    val tgt = tgtPath.map(new Lines(_))
    try {
      var count = 0
      while (src.hasNext) {
        var srcLine = src.next()
        val tgtLine = tgt match {
          case Some(t) => if (t.hasNext) t.next() else ""
          case None =>
            val tab = srcLine.indexOf('\t')
            if (tab >= 0) {
              val tl = srcLine.substring(tab + 1)
              srcLine = srcLine.substring(0, tab)
              tl
            } else ""
        }
        count += 1
        val id =
          if (addTargetNoIndex) tgtLine
          else if (addTarget) s"$count=$tgtLine"
          else count.toString
        f(id, srcLine)
      }
      count
    } finally {
      src.close()
      tgt.foreach(_.close())
    }
  }

  /** Collected form of [[eachRow]] for callers that want the whole corpus
    * (the Spark-side loaders; GoldenTm2Spec drives the same rows through
    * the distributed retrieval operator). */
  def readRows(
      tmFile: String,
      addTarget: Boolean = false,
      addTargetNoIndex: Boolean = false): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    eachRow(tmFile, addTarget, addTargetNoIndex)((id, src) => out += ((id, src)))
    out.result()
  }

  /** Index `tmFile` into the matcher (streaming, no full-corpus buffer);
    * returns the number of lines read. */
  def importTm(
      fm: FuzzyMatcher,
      tmFile: String,
      addTarget: Boolean = false,
      addTargetNoIndex: Boolean = false): Int =
    eachRow(tmFile, addTarget, addTargetNoIndex)((id, src) => fm.addTm(id, src))
}
