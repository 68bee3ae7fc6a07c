from cryo_spark.api import main
import sys

sys.exit(main())
