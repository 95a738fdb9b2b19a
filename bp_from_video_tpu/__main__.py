from bp_from_video_tpu.cli import main

raise SystemExit(main())
