package graft.ingest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter
import org.apache.spark.sql.types.StructType

/** Direct parquet footer → Spark schema, bypassing the DataFrameReader.
  *
  * `spark.read.parquet(f).schema` costs a FileIndex listing + datasource
  * resolution + an inference pass per call (~1 s each cold); schema-only
  * detection over many files needs none of that. Reading the footer with
  * parquet-hadoop and converting with Spark's own
  * ParquetToSparkSchemaConverter is ~10 ms per file and returns the
  * identical StructType (same converter Spark's scan uses).
  * The reference's equivalent is `_read_schema_only`
  * (pivot_and_boostrap/pivot_all_files.py:87-97).
  */
object Footers {

  /** Converter matching Spark's read-path defaults (binary→string off,
    * int96→timestamp on, nanos stay long — `Tables.events` handles the
    * rebuild for nanos inputs).
    */
  private def converter(nanosAsLong: Boolean) =
    new ParquetToSparkSchemaConverter(
      assumeBinaryIsString = true,
      assumeInt96IsTimestamp = true,
      caseSensitive = false,
      inferTimestampNTZ = false,
      nanosAsLong = nanosAsLong)

  /** Schema of one parquet file, or of the first data part when `path`
    * is a directory-style dataset (part files sorted by name for
    * determinism; `_SUCCESS`/hidden files skipped).
    */
  def schemaOf(conf: Configuration, path: String,
      nanosAsLong: Boolean = false): StructType = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val dataFile =
      if (st.isFile) p
      else fs.listStatus(p)
        .filter { s =>
          val n = s.getPath.getName
          s.isFile && !n.startsWith("_") && !n.startsWith(".")
        }
        .sortBy(_.getPath.getName)
        .headOption
        .map(_.getPath)
        .getOrElse(throw new java.io.FileNotFoundException(
          s"no data files under $path"))
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(dataFile, conf))
    try converter(nanosAsLong)
      .convert(reader.getFooter.getFileMetaData.getSchema)
    finally reader.close()
  }
}
