package graft.sources;

import org.apache.logging.log4j.Level;
import org.apache.logging.log4j.core.LoggerContext;
import org.apache.logging.log4j.core.appender.RollingFileAppender;
import org.apache.logging.log4j.core.appender.rolling.DefaultRolloverStrategy;
import org.apache.logging.log4j.core.appender.rolling.SizeBasedTriggeringPolicy;
import org.apache.logging.log4j.core.config.AppenderRef;
import org.apache.logging.log4j.core.config.Configuration;
import org.apache.logging.log4j.core.config.LoggerConfig;
import org.apache.logging.log4j.core.layout.PatternLayout;

/**
 * log4j2 builder plumbing for {@link RotatingLogs} — the RollingFileAppender
 * and LoggerConfig builders are F-bounded ({@code B extends Builder<B>}),
 * which Scala 2 infers as {@code Nothing}; this helper keeps the builder
 * chains in Java where inference is fine. All policy comes from the Scala
 * caller.
 */
final class Log4jRotation {

    private Log4jRotation() {}

    /** Build + install the size-rotated appender and an additivity-off
     *  logger on {@code ctx}; replaces any previous logger of that name. */
    static org.apache.logging.log4j.Logger install(
            LoggerContext ctx, String name, String logfile,
            long maxBytes, int backupCount, Level level) {
        Configuration config = ctx.getConfiguration();
        PatternLayout layout = PatternLayout.newBuilder()
                .withConfiguration(config)
                .withPattern("[%d{yyyy-MM-dd HH:mm:ss.SSS}] %p: %c: %m%n")
                .build();
        RollingFileAppender appender = RollingFileAppender.newBuilder()
                .setName("rotating-" + name)
                .withFileName(logfile)
                // fileIndex=min renames on rollover so .1 is the newest
                // backup — the reference handler's rotated layout
                .withFilePattern(logfile + ".%i")
                .withPolicy(SizeBasedTriggeringPolicy.createPolicy(Long.toString(maxBytes)))
                .withStrategy(DefaultRolloverStrategy.newBuilder()
                        .withMax(Integer.toString(backupCount))
                        .withMin("1")
                        .withFileIndex("min")
                        .withConfig(config)
                        .build())
                .setLayout(layout)
                .setConfiguration(config)
                .build();
        appender.start();
        config.removeLogger(name); // idempotent reconfigure
        config.addAppender(appender);
        AppenderRef ref = AppenderRef.createAppenderRef(appender.getName(), null, null);
        LoggerConfig loggerConfig = LoggerConfig.newBuilder()
                .withLoggerName(name)
                .withLevel(level)
                .withAdditivity(false)
                .withRefs(new AppenderRef[]{ref})
                .withConfig(config)
                .build();
        loggerConfig.addAppender(appender, null, null);
        config.addLogger(name, loggerConfig);
        ctx.updateLoggers();
        return ctx.getLogger(name);
    }
}
