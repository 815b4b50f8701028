from shine_tpu.cli import main

raise SystemExit(main())
