import sys

from smafa_tpu.cli import main

sys.exit(main())
