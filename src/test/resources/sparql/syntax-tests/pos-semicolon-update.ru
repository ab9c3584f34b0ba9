PREFIX : <http://x/>
INSERT DATA { :a :p :b } ;
DELETE DATA { :c :p :d } ;
