import sys

from credit_tpu.cli.main import main

sys.exit(main())
