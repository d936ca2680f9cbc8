from kafka2clickhouse_py_streamer_spark.runner import main

main()
