import org.apache.spark.sql.api.java.UDF1;
import java.text.Normalizer;

public class SparkGraftNfc implements UDF1<String, String> {
    @Override
    public String call(String s) {
        if (s == null) return null;
        return Normalizer.isNormalized(s, Normalizer.Form.NFC)
            ? s : Normalizer.normalize(s, Normalizer.Form.NFC);
    }
}
