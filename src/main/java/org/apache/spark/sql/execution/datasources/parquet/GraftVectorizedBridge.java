package org.apache.spark.sql.execution.datasources.parquet;

import java.io.IOException;

import org.apache.parquet.hadoop.ParquetFileReader;
import org.apache.parquet.schema.MessageType;

/**
 * Bridge into Spark's vectorized parquet reader with a CALLER-managed
 * {@link ParquetFileReader} — which is what lets graft's SQL scan pass
 * {@code ParquetReadOptions.withRecordFilter(...)}, so parquet-mr drops
 * whole row groups by statistics before a single page is decoded. Spark's
 * public {@code initialize(path, columns)} builds the file reader
 * internally with no filter hook, and the row-group-reader overload used
 * here is package-private — hence this one-class shim in Spark's package
 * (the same technique Iceberg/Delta use for their vectorized parquet
 * paths). No Spark internals are modified; this only forwards.
 */
public final class GraftVectorizedBridge {
  private GraftVectorizedBridge() {}

  /**
   * Initialize {@code reader} over the row groups that survived
   * {@code fr}'s filter. {@code requested} must be a projection of
   * {@code fr}'s file schema.
   */
  public static void initFiltered(
      VectorizedParquetRecordReader reader,
      MessageType requested,
      MessageType fileSchema,
      ParquetFileReader fr) throws IOException {
    fr.setRequestedSchema(requested);
    long rows = fr.getRecordCount();
    if (rows > Integer.MAX_VALUE) {
      // the reader's row counter is an int — truncating would silently end
      // the scan early; no sane file layout has 2^31 rows in one file
      throw new IOException("data file has " + rows + " rows after row-group "
          + "filtering — exceeds the vectorized reader's int row counter");
    }
    // base signature is initialize(fileSchema, requestedSchema, ...)
    reader.initialize(fileSchema, requested, new FileReaderRowGroups(fr),
        (int) rows);
  }

  /** Adapter over the caller's filtered ParquetFileReader. */
  private static final class FileReaderRowGroups
      implements SpecificParquetRecordReaderBase.ParquetRowGroupReader {
    private final ParquetFileReader fr;

    FileReaderRowGroups(ParquetFileReader fr) {
      this.fr = fr;
    }

    @Override
    public org.apache.parquet.column.page.PageReadStore readNextRowGroup()
        throws IOException {
      return fr.readNextRowGroup();
    }

    @Override
    public void close() throws IOException {
      fr.close();
    }
  }
}
